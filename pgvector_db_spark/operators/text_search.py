"""Full-text relevance search: Okapi BM25 top-k over a document table.

The reference delegates all text querying to Postgres (ILIKE patterns,
e.g. demo/similarity_search_demo.py:76,85,92); Postgres' own full-text
surface (tsvector ranking) is the natural extension a user of that stack
reaches for next. Spark-first design:

  tokenize -> explode -> tf per (doc, term)   [one shuffle on doc_id-term]
  document-frequency per term                  [tiny: |query terms| rows]
  corpus stats (N, avgdl)                      [single-row aggregate]
  per-term BM25 partial score -> sum per doc   [shuffle on doc_id]
  top-k via TakeOrderedAndProject              [no global sort]

Everything is built-in JVM expressions (no Python UDF). The per-term
scores are fixed to an integer grid (floor(x*1e6 + 0.5) micro-units)
before the final SUM so the aggregate is an order-independent BIGINT sum
— bit-exact against the DuckDB oracle regardless of partition count.

At 100 TB: the only wide exchanges are the two hash aggregations keyed by
(doc_id, term) then doc_id; df/N/avgdl are scalar or |terms|-row side
inputs, broadcast. The candidate set is filtered to query terms at the
explode, so the shuffled volume is O(matching postings), not O(corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = r"\s+"


def tokens_col(text_col):
    """Whitespace tokenization of lowercased, trimmed text (parity with the
    corpus tokenizer used by the dedup/quality operators)."""
    return F.split(F.trim(F.lower(text_col)), TOKEN_PATTERN)


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 relevance to a bag of query terms.

    Returns (id_col, score_micro BIGINT, n_matched) — score in 1e-6 units
    on the integer grid (exact, engine-independent); callers wanting the
    float divide by 1e6.
    """
    toks = docs.select(
        F.col(id_col),
        tokens_col(F.col(text_col)).alias("_toks"),
    ).select(
        F.col(id_col),
        F.size("_toks").alias("dl"),
        F.explode("_toks").alias("term"),
    )

    # corpus stats: one single-row aggregate over doc lengths (computed
    # from the same tokenization; integer sum / count -> exact avgdl)
    stats = docs.select(
        F.size(tokens_col(F.col(text_col))).alias("dl")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )

    matched = toks.filter(F.col("term").isin(query_terms))

    tf = matched.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.first("dl").alias("dl"),
    )

    # document frequency as a window over the tf postings — derived from
    # the SAME single corpus scan/aggregation rather than a second one
    # (the postings list is tiny relative to the corpus, so the extra
    # exchange on `term` is O(matches), not O(corpus))
    from pyspark.sql.window import Window as _W

    tf = tf.withColumn("df", F.count(F.lit(1)).over(_W.partitionBy("term")))

    return _score_and_topk(tf, stats, k, k1, b, id_col)


def _score_and_topk(
    tf: DataFrame, stats: DataFrame, k: int, k1: float, b: float, id_col: str
) -> DataFrame:
    """Shared scoring tail: ``tf`` carries (id, term, tf, dl, df); the
    SAME expression tree serves the scan path (bm25_topk) and the
    indexed path (BM25Index.search), so their grid-fixed scores are
    bitwise identical by construction."""
    scored = (
        tf.crossJoin(F.broadcast(stats))
        .withColumn("avgdl", F.col("sum_dl") / F.col("n_docs"))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (F.lit(k1) + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
        # integer grid before the order-sensitive double SUM
        .withColumn(
            "term_score_micro",
            F.floor(F.col("term_score") * 1e6 + F.lit(0.5)).cast("bigint"),
        )
    )

    agg = scored.groupBy(id_col).agg(
        F.sum("term_score_micro").alias("score_micro"),
        F.count(F.lit(1)).alias("n_matched"),
    )
    return agg.orderBy(
        F.col("score_micro").desc(), F.col(id_col).asc()
    ).limit(k)


def bm25_oracle_sql(
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB SQL computing the identical BM25 grid-fixed score."""
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
    WITH toks AS (
      SELECT doc_id,
             len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS dl,
             unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
      FROM documents
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM (
        SELECT len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS dl
        FROM documents)
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf, MIN(dl) AS dl
      FROM toks WHERE term IN ({terms})
      GROUP BY doc_id, term
    ),
    dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             CAST(floor(
               ln((stats.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
               * (tf.tf * ({k1} + 1.0))
               / (tf.tf + {k1} * (1.0 - {b} + {b} * tf.dl
                                  / (CAST(stats.sum_dl AS DOUBLE) / stats.n_docs)))
               * 1e6 + 0.5) AS BIGINT) AS term_score_micro
      FROM tf JOIN dft USING (term) CROSS JOIN stats
    )
    SELECT doc_id, SUM(term_score_micro) AS score_micro,
           COUNT(*) AS n_matched
    FROM scored GROUP BY doc_id
    ORDER BY score_micro DESC, doc_id ASC LIMIT {k}
    """


# ---------------------------------------------------------------------------
# Persisted inverted-index layout — the at-scale BM25 (text twin of the
# IVF layout in operators/ivf.py).
# ---------------------------------------------------------------------------


# per-path cache of (n_docs, sum_dl, n_buckets): the 1-row stats read is
# a full Spark job, pure per-query driver overhead if repeated (same
# pattern as operators/ivf._CENTROID_CACHE). Invalidated by build().
_STATS_CACHE: dict[str, tuple[int, int, int]] = {}


class BM25Index:
    """Build-once inverted index: per-query cost is a partition-pruned
    read of the query terms' postings, never a corpus scan.

    Layout (all plain parquet):
      postings/  (doc_id, term, tf, dl), partitionBy(bucket) where
                 bucket = crc32(term) % num_buckets — crc32 because the
                 driver can compute the probe set with zlib.crc32
                 byte-identically to Spark's ``crc32`` expression.
      terms/     (term, df), same bucketing — global document frequency
                 per term, vocabulary-sized.
      stats/     single row (n_docs, sum_dl).

    A query reads only the buckets its terms hash into (PartitionFilters
    at the scan), joins the matching (term, df) rows, broadcasts the
    1-row stats, and runs the SAME grid-fixed scoring expression as the
    scan path — bitwise-equal scores, pinned by tests. At 100 TB the
    build is one corpus pass; each search touches
    |query terms| / num_buckets of the postings bytes.
    """

    def __init__(self, spark, path: str, id_col: str = "doc_id"):
        self.spark = spark
        self.path = path
        self.id_col = id_col

    @classmethod
    def build(
        cls,
        docs: DataFrame,
        path: str,
        num_buckets: int = 64,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> "BM25Index":
        import os as _os

        spark = docs.sparkSession
        toks = docs.select(
            F.col(id_col), tokens_col(F.col(text_col)).alias("_toks")
        ).select(
            F.col(id_col),
            F.size("_toks").alias("dl"),
            F.explode("_toks").alias("term"),
        )
        tf = toks.groupBy(id_col, "term").agg(
            F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
        )
        bucket = F.pmod(F.crc32(F.col("term").cast("binary")), F.lit(num_buckets)).cast("int")
        (
            tf.withColumn("bucket", bucket)
            .repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(_os.path.join(path, "postings"))
        )
        dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        (
            dft.withColumn("bucket", bucket)
            .repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(_os.path.join(path, "terms"))
        )
        stats = (
            docs.select(F.size(tokens_col(F.col(text_col))).alias("dl"))
            .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl"))
            # bucket count rides in the stats row: empty buckets write no
            # partition dir, so the layout itself can't be trusted for it
            .withColumn("n_buckets", F.lit(num_buckets))
        )
        stats.coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(path, "stats")
        )
        _STATS_CACHE.pop(path, None)
        return cls(spark, path, id_col)

    def append(
        self,
        docs: DataFrame,
        text_col: str = "text",
    ) -> None:
        """Incremental insert (the maintenance parity of IVFIndex.append):
        the new batch's postings append into their term buckets; the
        affected buckets' (term, df) rows and the 1-row stats are
        REWRITTEN (df and n_docs/sum_dl are global counts, so they can't
        be blind-appended). Only the batch shuffles; existing postings
        files are untouched; terms/stats rewrites touch the affected
        buckets' worth of vocabulary rows, not the corpus."""
        import os as _os

        n_docs0, sum_dl0, nb = self._stats()
        toks = docs.select(
            F.col(self.id_col), tokens_col(F.col(text_col)).alias("_toks")
        ).select(
            F.col(self.id_col),
            F.size("_toks").alias("dl"),
            F.explode("_toks").alias("term"),
        )
        tf = toks.groupBy(self.id_col, "term").agg(
            F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
        )
        bucket = F.pmod(
            F.crc32(F.col("term").cast("binary")), F.lit(nb)
        ).cast("int")
        (
            tf.withColumn("bucket", bucket)
            .repartition("bucket")
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(_os.path.join(self.path, "postings"))
        )
        # merge df for the touched terms: old terms table (all buckets —
        # vocabulary-sized, cheap) + the batch's per-term doc counts
        delta = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        old = self.spark.read.parquet(
            _os.path.join(self.path, "terms")
        ).select("term", "df")
        merged = (
            old.unionByName(delta)
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
            .withColumn("bucket", bucket)
        )
        # stage-then-swap: the terms dir is being read and rewritten
        tmp_terms = _os.path.join(self.path, "terms_staged")
        merged.repartition("bucket").write.mode("overwrite").partitionBy(
            "bucket"
        ).parquet(tmp_terms)
        import shutil as _sh

        final_terms = _os.path.join(self.path, "terms")
        _sh.rmtree(final_terms)
        _os.rename(tmp_terms, final_terms)

        batch_stats = docs.select(
            F.size(tokens_col(F.col(text_col))).alias("dl")
        ).agg(
            F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
        ).first()
        new_stats = self.spark.createDataFrame(
            [(
                n_docs0 + int(batch_stats["n"]),
                sum_dl0 + int(batch_stats["s"] or 0),
                nb,
            )],
            "n_docs bigint, sum_dl bigint, n_buckets int",
        )
        tmp_stats = _os.path.join(self.path, "stats_staged")
        new_stats.coalesce(1).write.mode("overwrite").parquet(tmp_stats)
        final_stats = _os.path.join(self.path, "stats")
        _sh.rmtree(final_stats)
        _os.rename(tmp_stats, final_stats)
        _STATS_CACHE.pop(self.path, None)

    def search(
        self,
        query_terms: list[str],
        k: int = 20,
        k1: float = 1.2,
        b: float = 0.75,
    ) -> DataFrame:
        import os as _os
        import zlib

        # driver-side probe set: zlib.crc32 over UTF-8 == Spark's crc32
        # expression, and the modulo must match build's — the bucket
        # count is read off the layout's partition dirs
        post = self.spark.read.parquet(_os.path.join(self.path, "postings"))
        terms = self.spark.read.parquet(_os.path.join(self.path, "terms"))
        nb = self._num_buckets()
        probe = sorted(
            {zlib.crc32(t.encode("utf-8")) % nb for t in query_terms}
        )
        post = post.filter(F.col("bucket").isin(probe)).filter(
            F.col("term").isin(query_terms)
        )
        dft = terms.filter(F.col("bucket").isin(probe)).filter(
            F.col("term").isin(query_terms)
        )
        tf = post.join(F.broadcast(dft.select("term", "df")), "term")
        n_docs, sum_dl, _ = self._stats()
        stats = self.spark.createDataFrame(
            [(n_docs, sum_dl)], "n_docs bigint, sum_dl bigint"
        )
        return _score_and_topk(tf, stats, k, k1, b, self.id_col)

    def _stats(self) -> tuple[int, int, int]:
        import os as _os

        cached = _STATS_CACHE.get(self.path)
        if cached is None:
            row = self.spark.read.parquet(
                _os.path.join(self.path, "stats")
            ).first()
            cached = (
                int(row["n_docs"]), int(row["sum_dl"]), int(row["n_buckets"])
            )
            _STATS_CACHE[self.path] = cached
        return cached

    def _num_buckets(self) -> int:
        return self._stats()[2]
