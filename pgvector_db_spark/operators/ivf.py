"""IVFFLAT-equivalent batch vector index (SURVEY.md §4.3 — the core custom
piece).

pgvector's ivfflat (reference README.md:185 ``lists=100``,
demo/aws_rds_similarity_search_demo.py:134-139) clusters vectors into
``lists`` k-means cells, then probes the ``nprobe`` nearest cells at query
time. The Spark-native re-expression:

  build:  MLlib KMeans (cosine) on (optionally sampled) vectors
          → assign every row its nearest-centroid ``list_id`` (JVM-side
            model.transform — no Python boundary)
          → write the dataset ``partitionBy("list_id")`` + a small
            centroids parquet.
  search: rank centroids against the query driver-side (lists ≤ a few
          thousand floats — trivially small), then scan ONLY the top
          ``nprobe`` partitions (Catalyst partition pruning on
          ``list_id IN (...)``) and run the exact top-k kernel within.

Scale: the expensive build is one KMeans fit (sampled) + one partitioned
write; a search touches nprobe/lists of the data — on a 1000-executor
cluster that is the difference between a 100 TB scan and a 1 TB scan.
Recall/latency tradeoff is exactly pgvector's ``nprobe`` semantics; with
``nprobe = lists`` results equal the exact path (tested).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgvector_db_spark.operators.knn import knn

from pgvector_db_spark.utils import local_rows_df

# Per-path caches: centroid ranking runs per query, and re-reading the tiny
# centroids dataset (a full Spark job) or re-listing the data dataset's
# footers per search is pure driver overhead. Invalidated by build().
_CENTROID_CACHE: dict[str, tuple[str, list[tuple[int, list[float], float]]]] = {}
_DATA_CACHE: dict[tuple[int, str], DataFrame] = {}


class IVFIndex:
    """Handle to a built IVF index (data + centroids parquet datasets)."""

    def __init__(self, spark: SparkSession, path: str, vec_col: str, id_col: str):
        self.spark = spark
        self.path = path
        self.vec_col = vec_col
        self.id_col = id_col
        self._metric: str | None = None  # lazily read from the centroids

    @property
    def data_path(self) -> str:
        return os.path.join(self.path, "data")

    @property
    def centroids_path(self) -> str:
        return os.path.join(self.path, "centroids")

    # -- build ---------------------------------------------------------------

    @classmethod
    def build(
        cls,
        df: DataFrame,
        path: str,
        lists: int = 100,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        sample_fraction: float | None = None,
        seed: int = 42,
        metric: str = "cosine",
        centroids: list[list[float]] | None = None,
    ) -> IVFIndex:
        """CREATE INDEX ... USING ivfflat analogue.

        ``sample_fraction`` bounds the KMeans fit input (pgvector likewise
        samples for list creation); assignment always covers every row.
        ``metric`` mirrors the ivfflat operator classes:
        ``cosine``/``l2``/``ip`` for vector_cosine_ops / vector_l2_ops /
        vector_ip_ops (reference README.md:185 uses cosine). l2 and ip
        cluster with euclidean KMeans, matching pgvector's ivfflat which
        also builds IP indexes from l2 k-means cells.

        ``centroids``: precomputed list centers (e.g. from
        :func:`deterministic_sample_centroids`). Skips the MLlib fit —
        MLlib KMeans results depend on the session's partition layout
        even when seeded, so an oracle whose constants encode recall
        against a FRESH build needs centers that are a pure function of
        the data. Assignment is the same in-plan argmin ``append`` uses
        (distance fold + (dist, list_id) tie-break — deterministic per
        row regardless of partitioning).
        """
        if metric not in ("cosine", "l2", "ip"):
            raise ValueError(f"unsupported metric: {metric}")
        if centroids is not None and len(centroids) != lists:
            # silent mismatch would skew every downstream nprobe/curve
            # computation keyed to `lists`
            raise ValueError(
                f"explicit centroids ({len(centroids)}) != lists ({lists}); "
                f"pass lists=len(centroids)"
            )
        from pgvector_db_spark.functions.vector import l2_norm

        spark = df.sparkSession
        if centroids is not None:
            from pyspark.sql.window import Window

            from pgvector_db_spark.functions.vector import (
                cosine_distance,
                l2_distance,
            )

            cents = local_rows_df(
                spark,
                [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
                "list_id int, _centroid array<double>",
            )
            if metric == "cosine":
                dist = cosine_distance(F.col(vec_col), F.col("_centroid"))
            else:
                dist = l2_distance(F.col(vec_col), F.col("_centroid"))
            w = Window.partitionBy(id_col).orderBy(
                F.col("_dist").asc(), F.col("list_id").asc()
            )
            assigned = (
                df.join(F.broadcast(cents))
                .withColumn("_dist", dist)
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_dist", "_rn", "_centroid")
                .withColumn("_vnorm", l2_norm(F.col(vec_col)))
            )
            centers = [[float(x) for x in c] for c in centroids]
        else:
            from pyspark.ml.clustering import KMeans
            from pyspark.ml.functions import array_to_vector

            featured = df.withColumn(
                "_features", array_to_vector(F.col(vec_col))
            )
            fit_input = featured
            if sample_fraction is not None and sample_fraction < 1.0:
                fit_input = featured.sample(
                    fraction=sample_fraction, seed=seed
                )
            model = KMeans(
                k=lists,
                seed=seed,
                featuresCol="_features",
                predictionCol="list_id",
                distanceMeasure=(
                    "cosine" if metric == "cosine" else "euclidean"
                ),
            ).fit(fit_input)
            # Materialize each row's l2 norm in the layout: searches then
            # pay ONE fold per row (the dot product) instead of
            # re-deriving the norm per comparison — bitwise-identical
            # distances (same fold + sqrt as the on-the-fly path), so the
            # exact-path oracle holds.
            assigned = (
                model.transform(featured)
                .drop("_features")
                .withColumn("_vnorm", l2_norm(F.col(vec_col)))
            )
            centers = [
                [float(x) for x in c] for c in model.clusterCenters()
            ]
        (
            assigned.repartition("list_id")
            .write.mode("overwrite")
            .partitionBy("list_id")
            .parquet(os.path.join(path, "data"))
        )

        centroids = [
            (i, c, metric) for i, c in enumerate(centers)
        ]
        local_rows_df(
            spark, centroids,
            "list_id int, centroid array<double>, metric string",
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "centroids"))

        from pgvector_db_spark.operators.layout import invalidate_layout

        _CENTROID_CACHE.pop(os.path.join(path, "centroids"), None)
        _DATA_CACHE.pop((id(spark), os.path.join(path, "data")), None)
        invalidate_layout(spark, os.path.join(path, "data"))
        return cls(spark, path, vec_col, id_col)

    # -- incremental maintenance ---------------------------------------------

    def append(self, df: DataFrame) -> None:
        """INSERT-into-indexed-table analogue: pgvector's ivfflat assigns
        each newly inserted row to its nearest EXISTING list center and
        never refits centroids on insert — identically here: new rows get
        a ``list_id`` from the frozen centroids and are appended into the
        matching partitions of the layout.

        Assignment is a broadcast nested-loop over ``lists`` centroids
        (`B x lists` distance folds for a batch of B rows — the same work
        KMeans.transform does at build) followed by a per-row argmin; the
        append shuffles only the new batch, never touches existing data
        files. Heavily skewed/drifted inserts degrade recall exactly as
        they do in pgvector — rebuild (``build``) is the remedy there and
        here.
        """
        from pyspark.sql.window import Window

        from pgvector_db_spark.functions.vector import (
            cosine_distance,
            l2_distance,
            l2_norm,
        )

        metric = self.metric
        cents = local_rows_df(
            self.spark,
            [(lid, c) for lid, c, _ in self._centroids()],
            "list_id int, _centroid array<double>",
        )
        # cosine cells assign by cosine distance; l2 AND ip cells both
        # assign by euclidean (matching build(), which clusters ip with
        # euclidean KMeans exactly as pgvector does)
        if metric == "cosine":
            dist = cosine_distance(F.col(self.vec_col), F.col("_centroid"))
        else:
            dist = l2_distance(F.col(self.vec_col), F.col("_centroid"))
        w = Window.partitionBy(self.id_col).orderBy(
            F.col("_dist").asc(), F.col("list_id").asc()
        )
        assigned = (
            df.join(F.broadcast(cents))
            .withColumn("_dist", dist)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_dist", "_rn", "_centroid")
            .withColumn("_vnorm", l2_norm(F.col(self.vec_col)))
        )
        (
            assigned.repartition("list_id")
            .write.mode("append")
            .partitionBy("list_id")
            .parquet(self.data_path)
        )
        from pgvector_db_spark.operators.layout import invalidate_layout

        _DATA_CACHE.pop((id(self.spark), self.data_path), None)
        invalidate_layout(self.spark, self.data_path)

    # -- search --------------------------------------------------------------

    def _centroids(self) -> list[tuple[int, list[float], float]]:
        """(list_id, centroid, norm), cached per path — `lists` rows is
        broadcast-tiny; reading it is pgvector scanning list metadata,
        done once per index handle lifetime, not per query."""
        cached = _CENTROID_CACHE.get(self.centroids_path)
        if cached is None:
            rows = self.spark.read.parquet(self.centroids_path).collect()
            # metric column added with multi-metric support; absent on
            # older layouts -> cosine (the only metric they could hold)
            metric = (
                rows[0]["metric"] if rows and "metric" in rows[0].__fields__
                else "cosine"
            )
            cached = (
                metric,
                [
                    (
                        r["list_id"],
                        list(r["centroid"]),
                        math.sqrt(sum(x * x for x in r["centroid"])),
                    )
                    for r in rows
                ],
            )
            _CENTROID_CACHE[self.centroids_path] = cached
        self._metric = cached[0]
        return cached[1]

    @property
    def metric(self) -> str:
        if self._metric is None:
            self._centroids()
        return self._metric

    def _rank_lists(self, query_vec: list[float]) -> list[tuple[int, float]]:
        """Centroid ranking under the index's metric — the same argmin
        pgvector runs over list centers for the chosen operator class."""
        entries = self._centroids()
        ranked = []
        if self.metric == "cosine":
            qn = math.sqrt(sum(x * x for x in query_vec))
            for lid, c, cn in entries:
                dot = sum(x * y for x, y in zip(query_vec, c))
                dist = 1.0 - dot / (qn * cn) if qn and cn else 1.0
                ranked.append((lid, dist))
        elif self.metric == "l2":
            for lid, c, _ in entries:
                dist = math.sqrt(sum((x - y) ** 2 for x, y in zip(query_vec, c)))
                ranked.append((lid, dist))
        else:  # ip: rank by negative inner product (pgvector <#>)
            for lid, c, _ in entries:
                ranked.append((lid, -sum(x * y for x, y in zip(query_vec, c))))
        ranked.sort(key=lambda t: (t[1], t[0]))
        return ranked

    def _data(self) -> DataFrame:
        key = (id(self.spark), self.data_path)
        df = _DATA_CACHE.get(key)
        if df is None:
            df = self.spark.read.parquet(self.data_path)
            _DATA_CACHE[key] = df
        return df

    def _probed_data(self, probes: list[int]) -> DataFrame:
        """The probed lists' rows via a DIRECT read of only their
        ``list_id=`` partition directories (r12 VERDICT item #3 — the
        fix that halved the LSH point query's fixed cost, applied to
        IVF: ``knn_ivf_ms`` sat at exact-scan parity because the
        full-layout listing, not the pruned data, dominated). Row- and
        schema-identical to ``_data().filter(list_id.isin(probes))``;
        falls back to that read off local filesystems."""
        from pgvector_db_spark.operators.layout import (
            read_probed_partitions,
        )

        return read_probed_partitions(
            self.spark, self.data_path, "list_id", probes
        )

    def search(
        self, query_vec: list[float], k: int = 10, nprobe: int = 1
    ) -> DataFrame:
        """ANN top-k: probe the ``nprobe`` nearest lists only.

        The scan reads only the probed ``list_id=`` partition
        directories (direct partition-path read, the static-pruning
        fast path); unprobed data is never read, and non-probed
        partitions are not even listed.
        """
        probes = [lid for lid, _ in self._rank_lists(query_vec)[:nprobe]]
        data = self._probed_data(probes)
        # layouts built before norm materialization lack _vnorm — fall
        # back to the on-the-fly norms (same results, two extra folds);
        # the norm fast path only applies to the cosine kernel
        norm_col = (
            "_vnorm"
            if "_vnorm" in data.columns and self.metric == "cosine"
            else None
        )
        return knn(
            data, query_vec, k,
            vec_col=self.vec_col, id_col=self.id_col,
            distance=self.metric, norm_col=norm_col,
        ).drop("_vnorm")

    def search_filtered(
        self,
        query_vec: list[float],
        k: int = 10,
        filter_expr=None,
        nprobe: int = 1,
        max_probes: int | None = None,
    ) -> DataFrame:
        """Filtered ANN with pgvector 0.8 iterative-scan semantics
        (``ivfflat.iterative_scan``): when a relational predicate is
        selective, a fixed ``nprobe`` can return fewer than ``k``
        qualifying rows — so probe the ``nprobe`` nearest lists, apply the
        filter inside the survivors, and if fewer than ``k`` rows qualify
        DOUBLE the probed-list count and retry, until ``k`` rows qualify
        or ``max_probes`` lists (default: all) have been read.

        Every iteration stays partition-pruned (``list_id IN probes`` at
        the scan) and the predicate is pushed into the pruned scan, so
        the worst case equals one exact filtered scan while typical
        queries touch a handful of lists; iteration count is bounded by
        log2(lists). ``filter_expr`` is a Column or SQL string predicate
        over the indexed row's columns.
        """
        ranked = self._rank_lists(query_vec)
        cap = len(ranked) if max_probes is None else min(max_probes, len(ranked))
        p = max(1, min(nprobe, cap))
        while True:
            probes = [lid for lid, _ in ranked[:p]]
            data = self._probed_data(probes)
            if filter_expr is not None:
                data = data.filter(
                    F.expr(filter_expr) if isinstance(filter_expr, str)
                    else filter_expr
                )
            norm_col = (
                "_vnorm"
                if "_vnorm" in data.columns and self.metric == "cosine"
                else None
            )
            out = knn(
                data, query_vec, k,
                vec_col=self.vec_col, id_col=self.id_col,
                distance=self.metric, norm_col=norm_col,
            ).drop("_vnorm")
            # take(k) moves ≤ k tiny rows to the driver — the check that
            # decides whether pgvector would keep scanning
            if p >= cap or len(out.take(k)) >= k:
                return out
            p = min(p * 2, cap)

    def batch_search(
        self,
        queries: DataFrame,
        k: int = 10,
        nprobe: int = 1,
        q_id_col: str = "query_id",
        q_vec_col: str = "query_vec",
        mode: str = "auto",
        driver_batch_max: int = 8192,
    ) -> DataFrame:
        """ANN top-k for a BATCH of query vectors in ONE plan.

        Two probe-table strategies, selected by ``mode``:

        - ``driver`` — per-query centroid ranking on the driver (centroids
          are cached; the batch is collected). The union of probed lists
          is known at plan time, so the scan is STATICALLY partition-pruned
          (``list_id IN (...)``) and the probe table broadcasts. Right for
          interactive batches (≤ thousands of queries).
        - ``distributed`` — the corpus-vs-corpus shape (millions of
          queries: dedup sweeps, retrieval eval). The query batch NEVER
          leaves the executors: the tiny centroid table broadcasts into a
          query × centroid scored join, ``row_number() <= nprobe`` compiles
          to WindowGroupLimit (partial top-nprobe before the query_id
          shuffle), and the resulting probe table joins the layout on
          ``list_id``. The probe side is left unhinted — AQE picks a
          broadcast join when the batch turns out small, and a huge batch
          probes most lists anyway, making the full scan the right plan.
        - ``auto`` (default) — ``driver`` when a ``limit(max+1)`` count
          says the batch is ≤ ``driver_batch_max`` rows, else
          ``distributed``. Costs ONE extra (bounded) Spark job for the
          routing count, and assumes the batch is DETERMINISTIC: a
          ``sample``/``rand``-derived ``queries`` frame may count
          different rows than it later scores. For nondeterministic
          batches ``.persist()`` (or ``.localCheckpoint()``) the frame
          first; at scale, skip the probe job entirely by passing
          ``mode`` explicitly.

        Both modes use the same fold order everywhere (dot/norm sequential
        left folds, ties broken by ``list_id``), so they probe identical
        lists and return bitwise-identical results — pinned by
        tests/test_ivf.py.

        Returns (query_id, vec_id, distance, knn_rank), rank 1 = nearest,
        tie-broken by ``id_col``.
        """
        if self.metric != "cosine":
            raise NotImplementedError(
                "batch_search currently supports cosine indexes only; "
                "use search() per query for l2/ip"
            )
        if mode == "auto":
            small = (
                queries.limit(driver_batch_max + 1).count() <= driver_batch_max
            )
            mode = "driver" if small else "distributed"
        if mode == "driver":
            probe_df, probed = self._probe_table_driver(
                queries, nprobe, q_id_col, q_vec_col
            )
            return self._score_probes(
                probe_df, k, q_id_col, probed_lists=probed, broadcast_probes=True
            )
        if mode != "distributed":
            raise ValueError(f"unknown mode: {mode}")
        probe_df = self._probe_table_distributed(
            queries, nprobe, q_id_col, q_vec_col
        )
        return self._score_probes(
            probe_df, k, q_id_col, probed_lists=None, broadcast_probes=False
        )

    def _probe_table_driver(
        self, queries: DataFrame, nprobe: int, q_id_col: str, q_vec_col: str
    ) -> tuple[DataFrame, list[int]]:
        """Driver-side probe table: collect the batch, rank cached
        centroids per query in Python. Returns (probe_df, probed_lists)
        so the caller can statically prune the layout scan."""

        def _qnorm(vec: list[float]) -> float:
            acc = 0.0
            for x in vec:  # same sequential fold as l2_norm's aggregate
                acc += x * x
            return math.sqrt(acc)

        qrows = queries.select(q_id_col, q_vec_col).collect()
        pairs = [
            (r[q_id_col], lid, qv, _qnorm(qv))
            for r in qrows
            for qv in [[float(x) for x in r[q_vec_col]]]
            for lid, _ in self._rank_lists(qv)[:nprobe]
        ]
        probe_df = local_rows_df(
            self.spark,
            pairs,
            f"{q_id_col} bigint, list_id int, _qv array<double>, _qnorm double",
        )
        return probe_df, sorted({p[1] for p in pairs})

    def _probe_table_distributed(
        self, queries: DataFrame, nprobe: int, q_id_col: str, q_vec_col: str
    ) -> DataFrame:
        """Executor-side probe table: broadcast the ``lists``-row centroid
        table into a query × centroid join, score with the SAME fold order
        as :meth:`_rank_lists` (float32→float64 element widening is exact,
        so casting the query vector first matches the driver path's
        ``float(x)`` bitwise), rank with a WindowGroupLimit top-nprobe.
        No ``collect`` anywhere — driver memory never bounds the batch."""
        from pyspark.sql.window import Window

        from pgvector_db_spark.functions.vector import dot_product, l2_norm

        cents = local_rows_df(
            self.spark,
            [(lid, c, cn) for lid, c, cn in self._centroids()],
            "list_id int, _centroid array<double>, _cnorm double",
        )
        q = queries.select(
            F.col(q_id_col).cast("bigint").alias(q_id_col),
            F.transform(F.col(q_vec_col), lambda x: x.cast("double")).alias(
                "_qv"
            ),
        ).withColumn("_qnorm", l2_norm(F.col("_qv")))
        # same zero-norm guard as _rank_lists (`if qn and cn else 1.0`)
        cdist = F.when(
            (F.col("_qnorm") != 0.0) & (F.col("_cnorm") != 0.0),
            F.lit(1.0)
            - dot_product(F.col("_qv"), F.col("_centroid"))
            / (F.col("_qnorm") * F.col("_cnorm")),
        ).otherwise(F.lit(1.0))
        w = Window.partitionBy(q_id_col).orderBy(
            F.col("_cdist").asc(), F.col("list_id").asc()
        )
        return (
            q.join(F.broadcast(cents))
            .withColumn("_cdist", cdist)
            .withColumn("_cr", F.row_number().over(w))
            .filter(F.col("_cr") <= nprobe)
            .select(q_id_col, "list_id", "_qv", "_qnorm")
        )

    def _score_probes(
        self,
        probe_df: DataFrame,
        k: int,
        q_id_col: str,
        probed_lists: list[int] | None,
        broadcast_probes: bool,
    ) -> DataFrame:
        """Join the probe table to the layout on ``list_id`` (each row is
        scored ONLY against queries that probed its list, never the whole
        batch), exact-cosine score with materialized norms, and take the
        per-query top-k via WindowGroupLimit."""
        from pyspark.sql.window import Window

        from pgvector_db_spark.functions.vector import (
            cosine_distance,
            cosine_distance_precomputed,
        )

        if probed_lists is not None:
            # driver mode knows the probed union at plan time: direct
            # partition-path read, same fast path as the point query
            data = self._probed_data(probed_lists)
        else:
            data = self._data()
        probe = F.broadcast(probe_df) if broadcast_probes else probe_df
        joined = data.join(probe, "list_id")
        if "_vnorm" in data.columns:
            dist = cosine_distance_precomputed(
                F.col(self.vec_col), F.col("_qv"),
                F.col("_vnorm"), F.col("_qnorm"),
            )
        else:
            dist = cosine_distance(F.col(self.vec_col), F.col("_qv"))
        scored = joined.withColumn("distance", dist)
        w = Window.partitionBy(q_id_col).orderBy(
            F.col("distance").asc(), F.col(self.id_col).asc()
        )
        return (
            scored.withColumn("knn_rank", F.row_number().over(w).cast("int"))
            .filter(F.col("knn_rank") <= k)
            .select(q_id_col, self.id_col, "distance", "knn_rank")
        )

    def recall_at_k(
        self, base: DataFrame, query_vec: list[float], k: int, nprobe: int
    ) -> float:
        """Fraction of exact top-k recovered by the probed search."""
        exact = {
            r[self.id_col]
            for r in knn(
                base, query_vec, k, self.vec_col, self.id_col,
                distance=self.metric,
            ).collect()
        }
        approx = {r[self.id_col] for r in self.search(query_vec, k, nprobe).collect()}
        return len(exact & approx) / k

    # -- recall-governed probe calibration ------------------------------------

    def autoprobe_curve(
        self,
        queries: DataFrame,
        k: int = 10,
        q_id_col: str = "query_id",
        q_vec_col: str = "query_vec",
        exact: DataFrame | None = None,
    ) -> DataFrame:
        """recall@k as a function of ``nprobe`` over a validation query
        batch, computed in ONE distributed plan — no per-nprobe search
        loop. ``exact`` optionally supplies a precomputed
        ``knn_batch(self._data(), queries, k)`` result so a caller that
        also needs the exact frame pays the batch-kNN pass once.

        Identity: a probed search returns the exact top-k of the probed
        partitions' union, so an exact top-k member is recovered iff its
        list is among the query's ``nprobe`` nearest centroids. The
        whole curve therefore falls out of (exact top-k per query) ⋈
        (member's list_id) ⋈ (centroid rank per query) — one batch-kNN
        pass over the layout plus lists-bounded joins, the same cost as
        measuring recall at a SINGLE nprobe. This is pgvector's
        ``ivfflat.probes`` dial measured wholesale (reference
        README.md:185 exposes ``lists``; probes is the serving knob).

        Returns one row per nprobe in 1..lists:
        ``(nprobe, cum_hits, k_total, recall_micro)`` where recall_micro
        = floor(cum_hits * 1e6 / k_total + 0.5).
        """
        from pyspark.sql.window import Window

        from pgvector_db_spark.functions.vector import (
            cosine_distance,
            inner_product_distance,
            l2_distance,
        )
        from pgvector_db_spark.operators.knn import knn_batch

        data = self._data()
        if exact is None:
            # the exact kernel scores under the INDEX metric — the
            # identity relates the probed search (metric-ranked lists,
            # metric-ranked members) to the metric's own exact top-k
            exact = knn_batch(
                data, queries, k,
                vec_col=self.vec_col, id_col=self.id_col,
                q_id_col=q_id_col, q_vec_col=q_vec_col,
                metric=self.metric,
            )

        cent_rows = self._centroids()
        cents = local_rows_df(
            self.spark,
            [(lid, c) for lid, c, _ in cent_rows],
            "list_id int, _centroid array<double>",
        )
        # the centroid list is already driver-resident — a Spark job
        # for its count would be pure overhead (r13)
        n_lists = len(cent_rows)
        # centroid rank per query: the same (distance asc, list_id asc)
        # order search()'s _rank_lists applies
        dist = {
            "cosine": cosine_distance,
            "l2": l2_distance,
            "ip": inner_product_distance,
        }[self.metric](F.col("_centroid"), F.col("_qv"))
        w = Window.partitionBy(q_id_col).orderBy(
            F.col("_cdist").asc(), F.col("list_id").asc()
        )
        crank = (
            queries.select(F.col(q_id_col), F.col(q_vec_col).alias("_qv"))
            .crossJoin(F.broadcast(cents))
            .withColumn("_cdist", dist)
            .select(
                q_id_col,
                "list_id",
                F.row_number().over(w).cast("int").alias("_crank"),
            )
        )
        hits = (
            exact.join(
                data.select(F.col(self.id_col), F.col("list_id")),
                self.id_col,
            )
            .join(crank, [q_id_col, "list_id"])
            .select(F.col("_crank"))
        )
        counts = hits.groupBy("_crank").agg(
            F.count(F.lit(1)).cast("bigint").alias("_n")
        )
        # k_total = Σ per-rank counts — derived from the ≤lists-row
        # counts frame instead of traversing the exact⋈data⋈crank join
        # subtree a second time (r13); coalesce keeps the empty-batch
        # value 0, matching the old COUNT(*)
        totals = counts.agg(
            F.coalesce(F.sum("_n"), F.lit(0))
            .cast("bigint")
            .alias("k_total")
        )
        spine = self.spark.range(1, n_lists + 1).select(
            F.col("id").cast("int").alias("nprobe")
        )
        # cumulative hits by bounded theta-join over the ≤lists-row count
        # frame (no unpartitioned window)
        curve = (
            spine.join(
                F.broadcast(counts), counts["_crank"] <= spine["nprobe"], "left"
            )
            .groupBy("nprobe")
            .agg(F.coalesce(F.sum("_n"), F.lit(0)).cast("bigint").alias("cum_hits"))
            .crossJoin(F.broadcast(totals))
            .withColumn(
                "recall_micro",
                F.floor(
                    F.col("cum_hits").cast("double")
                    / F.col("k_total").cast("double")
                    * F.lit(1e6)
                    + F.lit(0.5)
                ).cast("bigint"),
            )
        )
        return curve

    def autoprobe(
        self,
        queries: DataFrame,
        k: int = 10,
        target_recall_micro: int = 800_000,
        q_id_col: str = "query_id",
        q_vec_col: str = "query_vec",
    ) -> DataFrame:
        """Pick the smallest ``nprobe`` whose validation recall@k meets
        ``target_recall_micro`` (recall in millionths), the way a
        pgvector operator tunes ``ivfflat.probes`` against a recall SLO
        — from measured evidence, not a hardcoded guess.

        One audit row; the curve and the distance sum are computed
        in-plan, the five flags are folded driver-side from the
        collected ≤lists-row curve (bounded metadata, like every
        centroid ranking):

        - ``n_queries`` / ``k_total``     validation batch shape
        - ``target_recall_micro``         the SLO
        - ``chosen_nprobe``               min nprobe meeting the target
                                          (lists if none does — recall
                                          at nprobe=lists is 1.0 exact)
        - ``chosen_meets_target``         recall(chosen) >= target
        - ``chosen_minimal``              chosen == 1 OR
                                          recall(chosen - 1) < target
        - ``curve_monotone``              recall non-decreasing in nprobe
                                          (the probe-superset identity —
                                          a broken layout join flips it)
        - ``fullprobe_perfect``           recall(lists) == 1.0
        - ``exact_topk_sum_nano``         1e-9-grid sum of the validation
                                          exact top-k distances — the
                                          cross-engine honesty column
        """
        from pgvector_db_spark.operators.knn import knn_batch

        # one batch-kNN pass over the layout, shared by the curve and
        # the cross-engine distance sum
        exact = knn_batch(
            self._data(), queries, k,
            vec_col=self.vec_col, id_col=self.id_col,
            q_id_col=q_id_col, q_vec_col=q_vec_col,
            metric=self.metric,
        ).localCheckpoint(eager=True)
        curve = self.autoprobe_curve(
            queries, k, q_id_col=q_id_col, q_vec_col=q_vec_col, exact=exact
        )
        # r13: the curve is ≤ lists rows — collect it and fold the five
        # audit values in the driver instead of assembling six
        # one-row-frame cross joins (each its own AQE stage; the old
        # tail dominated the query's fixed cost). Every value is still
        # derived from the measured in-plan curve/exact frames; the
        # comparisons are the same integer compares on the same
        # numbers, so the emitted row is bit-identical.
        rows = sorted(curve.collect(), key=lambda r: r["nprobe"])
        _schema = (
            "n_queries bigint, k_total bigint, target_recall_micro bigint,"
            " chosen_nprobe int, chosen_meets_target int,"
            " chosen_minimal int, curve_monotone int,"
            " fullprobe_perfect int, exact_topk_sum_nano bigint"
        )
        if not rows:
            # degenerate layout (zero centroid rows → empty probe spine):
            # the pre-r13 all-in-plan spelling cross-joined empty one-row
            # frames into an EMPTY result; keep that contract instead of
            # an IndexError on rows[0] (r13 ADVICE)
            return local_rows_df(self.spark, [], _schema)
        k_total = int(rows[0]["k_total"])
        max_probe = rows[-1]["nprobe"]
        by_np = {r["nprobe"]: r for r in rows}
        meeting = [
            r["nprobe"]
            for r in rows
            if r["recall_micro"] >= target_recall_micro
        ]
        chosen = min(meeting) if meeting else max_probe
        chosen_meets = int(
            by_np[chosen]["recall_micro"] >= target_recall_micro
        )
        chosen_minimal = int(
            chosen == 1
            or by_np[chosen - 1]["recall_micro"] < target_recall_micro
        )
        monotone = (
            int(
                all(
                    rows[i + 1]["cum_hits"] >= rows[i]["cum_hits"]
                    for i in range(len(rows) - 1)
                )
            )
            if len(rows) > 1
            else None  # single-list curve has no adjacent pair (as before)
        )
        full = int(by_np[max_probe]["recall_micro"] == 1_000_000)
        srow = exact.agg(
            F.sum(
                F.floor(F.col("distance") * F.lit(1e9) + F.lit(0.5)).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("s")
        ).first()
        exact_sum = None if srow["s"] is None else int(srow["s"])
        return local_rows_df(
            self.spark,
            [
                (
                    int(k_total / k),
                    k_total,
                    int(target_recall_micro),
                    int(chosen),
                    chosen_meets,
                    chosen_minimal,
                    monotone,
                    full,
                    exact_sum,
                )
            ],
            _schema,
        )


def deterministic_sample_centroids(
    df,
    lists: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample: int = 2048,
    iters: int = 10,
    seed: int = 42,
    metric: str = "cosine",
) -> list[list[float]]:
    """List centers as a PURE FUNCTION of the data: a hash-ORDERED
    bounded sample — ``ORDER BY xxhash64(id), id LIMIT sample`` — is a
    deterministic pseudo-random draw (id-ordered sampling would bias
    toward low ids: an appended batch living in a high id range would
    never be sampled and its region never get a center), fit with
    seeded driver-side Lloyd (operators/pq._kmeans); driver memory is
    bounded by ``sample`` at any table size. Unlike MLlib KMeans —
    whose seeded result still varies with the session's partition
    layout — these centers are identical across any session shape, so
    recall measured against a fresh build of them can be pinned as an
    oracle constant.

    For ``metric="cosine"`` the sample rows are L2-normalized before
    Lloyd (spherical k-means: euclidean centers over unit vectors rank
    directions, which is what the cosine probe order needs — raw-scale
    euclidean centers would cluster by magnitude).
    """
    import numpy as np

    from pgvector_db_spark.operators.pq import _kmeans

    pdf = (
        df.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(sample)
        .toPandas()
    )
    x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    if metric == "cosine":
        norms = np.sqrt((x * x).sum(axis=1, keepdims=True))
        x = x / np.where(norms == 0.0, 1.0, norms)
    rng = np.random.RandomState(seed)
    return [[float(v) for v in c] for c in _kmeans(x, lists, iters, rng)]


def _probe_cost(idx: IVFIndex, queries: DataFrame, nprobe: int,
                q_id_col: str = "query_id", q_vec_col: str = "query_vec"):
    """(total rows the workload would scan at ``nprobe``, as one 1-row
    frame) — sum over queries of the sizes of each query's ``nprobe``
    metric-ranked lists. THE latency driver of an IVF serving tier: a
    probed search scans exactly these rows. Bounded joins only
    (queries x lists centroid ranking, lists-row size frame)."""
    from pyspark.sql.window import Window

    from pgvector_db_spark.functions.vector import (
        cosine_distance,
        inner_product_distance,
        l2_distance,
    )

    cents = local_rows_df(
        idx.spark,
        [(lid, c) for lid, c, _ in idx._centroids()],
        "list_id int, _centroid array<double>",
    )
    dist = {
        "cosine": cosine_distance,
        "l2": l2_distance,
        "ip": inner_product_distance,
    }[idx.metric](F.col("_centroid"), F.col("_qv"))
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("_cdist").asc(), F.col("list_id").asc()
    )
    probed = (
        queries.select(F.col(q_id_col), F.col(q_vec_col).alias("_qv"))
        .crossJoin(F.broadcast(cents))
        .withColumn("_cdist", dist)
        .withColumn("_crank", F.row_number().over(w))
        .filter(F.col("_crank") <= nprobe)
        .select(q_id_col, "list_id")
    )
    sizes = idx._data().groupBy("list_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("_sz")
    )
    return probed.join(F.broadcast(sizes), "list_id").agg(
        F.sum("_sz").cast("bigint").alias("probed_rows")
    )


def ivf_health_report(
    idx: IVFIndex,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    max_share_threshold_ppm: int = 250_000,
    min_recall_micro: int = 800_000,
) -> DataFrame:
    """Measure-only IVF health check — the scheduled pre-REINDEX
    evidence operator (r10 VERDICT item #4). Everything
    :func:`ivf_rebuild_decision` measures about the CURRENT layout,
    WITHOUT building a candidate index: at 100 TB the whole point of
    the decision is to avoid paying the rebuild until the evidence
    demands it, so this report runs on schedule (cheap: one batch-kNN
    pass + lists-bounded joins + two lists-row aggregates) and its
    ``rebuild_recommended`` flag gates the expensive
    ``ivf_rebuild_decision`` / REINDEX path.

    Audit row (every value computed in-plan from the live layout):
      n_rows, n_queries, lists, nprobe            — shape integers
      max_share_ppm                               — max list size as ppm
                                                    of the table (the
                                                    balance number
                                                    pgvector operators
                                                    watch)
      fair_share_ppm                              — 10^6 / lists
      probed_rows                                 — total rows the
                                                    workload scans at
                                                    the serving nprobe
      scan_fraction_ppm                           — probed_rows as ppm
                                                    of (n_rows *
                                                    n_queries): the
                                                    selectivity the
                                                    probe actually buys
      recall_micro                                — recall@k at the
                                                    serving nprobe vs
                                                    the exact kernel
      rebuild_recommended = max_share_ppm > threshold
      recall_ok           = recall_micro >= min_recall_micro
      exact_topk_sum_nano                         — cross-engine honesty
                                                    column (the exact
                                                    top-k distance sum
                                                    an oracle recomputes)

    Same eager-checkpoint discipline as the full lifecycle: the audit
    frames share base lineage and combining lazy subtrees in one
    crossJoin plan can silently mis-resolve their internal joins
    (docs/SCALE_AUDIT.md r10)."""
    from pgvector_db_spark.operators.knn import knn_batch

    def _ck(d: DataFrame) -> DataFrame:
        return d.localCheckpoint(eager=True)

    lists = len(idx._centroids())
    data = idx._data()
    full = data.drop("list_id", "_vnorm")
    # the exact kernel MUST score under the index's own metric — an
    # l2/ip index measured against a cosine exact top-k would report
    # recall_micro / exact_topk_sum_nano against the wrong ground truth
    # (r11 ADVICE); autoprobe_curve's internal default already uses
    # self.metric, so only this pre-supplied kernel needs the pin
    exact = knn_batch(
        full, queries, k, vec_col=idx.vec_col, id_col=idx.id_col,
        metric=idx.metric,
    ).localCheckpoint(eager=True)

    n_rows = _ck(data.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows")))
    n_queries = _ck(
        queries.agg(F.count(F.lit(1)).cast("bigint").alias("n_queries"))
    )
    share = _ck(_max_list_share_ppm(idx))
    cost = _ck(_probe_cost(idx, queries, nprobe))
    rec = _ck(
        idx.autoprobe_curve(queries, k, exact=exact)
        .filter(F.col("nprobe") == nprobe)
        .select("recall_micro")
    )
    exact_sum = _ck(
        exact.agg(
            F.sum(
                F.floor(
                    F.col("distance") * F.lit(1e9) + F.lit(0.5)
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("exact_topk_sum_nano")
        )
    )
    out = (
        n_rows.crossJoin(n_queries)
        .crossJoin(share)
        .crossJoin(cost)
        .crossJoin(rec)
        .crossJoin(exact_sum)
    )
    return out.select(
        "n_rows",
        "n_queries",
        F.lit(lists).cast("int").alias("lists"),
        F.lit(nprobe).cast("int").alias("nprobe"),
        "max_share_ppm",
        F.lit(int(1e6 // lists)).cast("bigint").alias("fair_share_ppm"),
        "probed_rows",
        F.floor(
            F.col("probed_rows").cast("double")
            / (F.col("n_rows") * F.col("n_queries")).cast("double")
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("scan_fraction_ppm"),
        "recall_micro",
        (F.col("max_share_ppm") > max_share_threshold_ppm)
        .cast("int")
        .alias("rebuild_recommended"),
        (F.col("recall_micro") >= min_recall_micro)
        .cast("int")
        .alias("recall_ok"),
        "exact_topk_sum_nano",
    )


def _max_list_share_ppm(idx: IVFIndex):
    """max list size as ppm of the table — the balance number pgvector
    operators watch for REINDEX (1-row frame)."""
    sizes = idx._data().groupBy("list_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("_sz")
    )
    return sizes.agg(
        F.floor(
            F.max("_sz").cast("double")
            / F.sum("_sz").cast("double")
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("max_share_ppm")
    )


def ivf_rebuild_decision(
    spark,
    base: DataFrame,
    drift: DataFrame,
    queries_before: DataFrame,
    queries_after: DataFrame,
    workdir: str,
    k: int = 10,
    nprobe: int = 2,
    max_share_threshold_ppm: int = 250_000,
    recall_tolerance_micro: int = 100_000,
    lists: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The IVF staleness lifecycle as ONE audited operator: measure,
    append a drifted batch, re-measure, decide whether to rebuild from
    the measured evidence, rebuild, and prove the rebuild repaired what
    append actually damages. pgvector's ivfflat never refits centroids
    on INSERT; ``REINDEX`` is the remedy (reference README.md:185
    index family).

    What a skewed append PROVABLY degrades here is the LAYOUT, not
    necessarily recall: the appended region piles into the few existing
    cells nearest it, so (a) list balance breaks (``max_list_share``)
    and (b) the rows a probed search must scan for the new workload
    balloon (``probed_rows`` — the true latency driver: a probed search
    scans exactly the rows of its ranked lists). Recall@nprobe on a
    diverse corpus is roughly layout-insensitive (the probe-superset
    identity: what matters is agreement between a query's centroid
    ranking and its neighbors' assignments — similar for any
    equally-coarse center set), so the decision keys on balance, with
    recall REPORTED and gated only by a no-collapse tolerance. All
    decision inputs are deterministic integers: centers come from
    :func:`deterministic_sample_centroids` (a pure function of the
    data — MLlib KMeans varies with session partitioning even when
    seeded) and assignment is the per-row argmin.

    Audit row:
      n_base, n_appended, nprobe,
      recall_before/after/rebuilt_micro      (autoprobe curve reads),
      max_share_after/rebuilt_ppm, probed_rows_after/rebuilt,
      rebuild_recommended = max_share_after  > threshold,
      rebalanced          = max_share_rebuilt < max_share_after,
      probe_cost_reduced  = probed_rows_rebuilt < probed_rows_after,
      recall_preserved    = recall_rebuilt + tolerance >= recall_after,
      exact_topk_sum_nano (cross-engine honesty column).

    Every bounded frame is localCheckpoint'ed EAGERLY at its point in
    the lifecycle, for two reasons that both corrupt silently
    otherwise: (1) the before-read must evaluate BEFORE the append
    mutates the layout (a lazy plan re-reads the grown file set at the
    final collect); (2) the curve subtrees share base lineage, and
    combining them in one crossJoin plan lets attribute dedup
    mis-resolve their internal join conditions (observed: a halved
    hits count). Scale shape: three autoprobe curve reads (each one
    batch-kNN pass + lists-bounded joins), two lists-row size
    aggregates, one rebuild (the same repartition-by-list write as any
    build).
    """
    from pgvector_db_spark.operators.knn import knn_batch

    def _ck(df1):
        return df1.localCheckpoint(eager=True)

    base_cents = deterministic_sample_centroids(
        base, lists, vec_col=vec_col, id_col=id_col
    )
    idx = IVFIndex.build(
        base, f"{workdir}/idx", lists=lists, centroids=base_cents
    )
    before = _ck(
        idx.autoprobe_curve(queries_before, k)
        .filter(F.col("nprobe") == nprobe)
        .select(F.col("recall_micro").alias("recall_before_micro"))
    )

    idx.append(drift)
    landed = idx._data()
    full = landed.drop("list_id", "_vnorm")
    # score under the index metric (r11 ADVICE): the shared exact
    # kernel feeds both curves' recall and the honesty column
    exact = knn_batch(
        full, queries_after, k, vec_col=vec_col, id_col=id_col,
        metric=idx.metric,
    ).localCheckpoint(eager=True)
    after = _ck(
        idx.autoprobe_curve(queries_after, k, exact=exact)
        .filter(F.col("nprobe") == nprobe)
        .select(F.col("recall_micro").alias("recall_after_micro"))
    )
    share_after = _ck(
        _max_list_share_ppm(idx).withColumnRenamed(
            "max_share_ppm", "max_share_after_ppm"
        )
    )
    cost_after = _ck(
        _probe_cost(idx, queries_after, nprobe).withColumnRenamed(
            "probed_rows", "probed_rows_after"
        )
    )

    full_cents = deterministic_sample_centroids(
        full, lists, vec_col=vec_col, id_col=id_col
    )
    idx2 = IVFIndex.build(
        full, f"{workdir}/idx2", lists=lists, centroids=full_cents
    )
    rebuilt = _ck(
        idx2.autoprobe_curve(queries_after, k, exact=exact)
        .filter(F.col("nprobe") == nprobe)
        .select(F.col("recall_micro").alias("recall_rebuilt_micro"))
    )
    share_rebuilt = _ck(
        _max_list_share_ppm(idx2).withColumnRenamed(
            "max_share_ppm", "max_share_rebuilt_ppm"
        )
    )
    cost_rebuilt = _ck(
        _probe_cost(idx2, queries_after, nprobe).withColumnRenamed(
            "probed_rows", "probed_rows_rebuilt"
        )
    )

    n_base = base.agg(F.count(F.lit(1)).cast("bigint").alias("n_base"))
    n_app = drift.agg(F.count(F.lit(1)).cast("bigint").alias("n_appended"))
    exact_sum = exact.agg(
        F.sum(
            F.floor(F.col("distance") * F.lit(1e9) + F.lit(0.5)).cast("bigint")
        )
        .cast("bigint")
        .alias("exact_topk_sum_nano")
    )
    out = (
        n_base.crossJoin(n_app)
        .crossJoin(before)
        .crossJoin(after)
        .crossJoin(rebuilt)
        .crossJoin(share_after)
        .crossJoin(share_rebuilt)
        .crossJoin(cost_after)
        .crossJoin(cost_rebuilt)
        .crossJoin(exact_sum)
    )
    return out.select(
        "n_base",
        "n_appended",
        F.lit(nprobe).cast("int").alias("nprobe"),
        "recall_before_micro",
        "recall_after_micro",
        "recall_rebuilt_micro",
        "max_share_after_ppm",
        "max_share_rebuilt_ppm",
        "probed_rows_after",
        "probed_rows_rebuilt",
        (F.col("max_share_after_ppm") > max_share_threshold_ppm)
        .cast("int")
        .alias("rebuild_recommended"),
        (F.col("max_share_rebuilt_ppm") < F.col("max_share_after_ppm"))
        .cast("int")
        .alias("rebalanced"),
        (F.col("probed_rows_rebuilt") < F.col("probed_rows_after"))
        .cast("int")
        .alias("probe_cost_reduced"),
        (
            F.col("recall_rebuilt_micro") + F.lit(recall_tolerance_micro)
            >= F.col("recall_after_micro")
        )
        .cast("int")
        .alias("recall_preserved"),
        "exact_topk_sum_nano",
    )
