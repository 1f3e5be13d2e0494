"""Phase-level profiler for the round-13 optimization targets.

Times the sub-phases of the expensive bench metrics SOLO (one metric per
invocation, nothing else running) so the optimization work attacks the
measured cost, not the guessed one (guide §1.1). Each phase is timed with
the noop sink where the phase is a transformation (guide §1.4), or by its
natural action where the phase IS an action (checkpoint/collect).

Usage: python tools/profile_hot.py <target> [sf_dir]
Targets: bpe, prefix, pagerank, autoprobe, bm25, batch_ann, cc
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from pgvector_db_spark import get_spark  # noqa: E402
from pgvector_db_spark.catalog import load_tables  # noqa: E402

PHASES: list[tuple[str, float]] = []


def phase(name: str, thunk):
    spark = get_spark("profile")
    spark.sparkContext.setJobDescription(name)
    t0 = time.time()
    out = thunk()
    dt = time.time() - t0
    PHASES.append((name, dt))
    print(f"  {name}: {dt:.3f}s", flush=True)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def prof_bpe(spark, sf_dir):
    from pgvector_db_spark.queries import _bpe_dialect

    tok0, pairs, size, part, fold = _bpe_dialect("spark")
    t = load_tables(spark, sf_dir)
    enc = (
        t["documents"]
        .filter("length(trim(text)) > 0")
        .selectExpr("doc_id", f"{tok0} AS enc")
        .selectExpr("doc_id", "enc", f"CAST({size('enc')} AS BIGINT) AS n_raw")
    )
    for rnd in range(1, 5):
        enc = phase(f"r{rnd} checkpoint(fold prev)", lambda e=enc: e.localCheckpoint(eager=True))
        m = phase(
            f"r{rnd} pair argmax",
            lambda e=enc: (
                e.filter(f"{size('enc')} >= 2")
                .selectExpr(f"{pairs('enc')} AS pair")
                .groupBy("pair")
                .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
                .orderBy(F.col("c").desc(), F.col("pair").asc())
                .first()
            ),
        )
        left, right = m["pair"].split(" ", 1)
        le = "'" + left.replace("'", "''") + "'"
        re_ = "'" + right.replace("'", "''") + "'"
        enc = enc.selectExpr("doc_id", f"{fold('enc', le, re_)} AS enc", "n_raw")
        phase(
            f"r{rnd} totals agg (fold recompute)",
            lambda e=enc: e.agg(F.sum(F.expr(f"CAST({size('enc')} AS BIGINT)"))).first(),
        )


def prof_prefix(spark, sf_dir):
    from pyspark.sql.window import Window

    from pgvector_db_spark.operators.dedup import _word_ngrams

    t = load_tables(spark, sf_dir)
    df = t["documents"]
    n, tau_num, tau_den = 3, 3, 5
    id_col, text_col = "doc_id", "text"
    base = df.select(F.col(id_col), _word_ngrams(text_col, n).alias("_ng"))
    base = base.persist()
    phase("base ngram materialize (count)", lambda: base.count())
    posting = base.select(
        F.col(id_col), F.size("_ng").alias("_s"), F.explode("_ng").alias("_g")
    )
    dfreq = posting.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
    phase("dfreq agg", lambda: noop(dfreq))
    ranked = posting.join(dfreq, "_g").withColumn(
        "_pos",
        F.row_number().over(
            Window.partitionBy(id_col).orderBy(F.asc("_df"), F.asc("_g"))
        ),
    )
    prefix = ranked.filter(
        F.col("_pos")
        <= F.col("_s")
        - F.expr(f"(({tau_num} * _s + {tau_den - 1}) div {tau_den})")
        + 1
    ).select(F.col(id_col), F.col("_s"), F.col("_g"))
    prefix = phase("rank+prefix (checkpoint)", lambda: prefix.localCheckpoint(eager=True))
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "_g")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .filter(
            F.lit(tau_den) * F.least(F.col("a._s"), F.col("b._s"))
            >= F.lit(tau_num) * F.greatest(F.col("a._s"), F.col("b._s"))
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    cand = phase("prefix self-join + distinct (checkpoint)", lambda: cand.localCheckpoint(eager=True))
    print("  cand pairs:", cand.count())
    out = (
        cand.join(
            base.select(F.col(id_col).alias("id_a"), F.col("_ng").alias("_nga")),
            "id_a",
        )
        .join(
            base.select(F.col(id_col).alias("id_b"), F.col("_ng").alias("_ngb")),
            "id_b",
        )
        .withColumn("n_inter", F.size(F.array_intersect("_nga", "_ngb")).cast("bigint"))
        .withColumn(
            "n_union",
            F.size(F.array_distinct(F.concat("_nga", "_ngb"))).cast("bigint"),
        )
        .filter(F.lit(tau_den) * F.col("n_inter") >= F.lit(tau_num) * F.col("n_union"))
        .select("id_a", "id_b", "n_inter", "n_union")
    )
    phase("verify joins", lambda: noop(out))
    base.unpersist()


def prof_pagerank(spark, sf_dir):
    from pgvector_db_spark.queries import REGISTRY

    fn = REGISTRY["ds_pagerank_partsupp"].spark_fn
    phase("full query count", lambda: fn(spark, sf_dir).count())


def prof_autoprobe(spark, sf_dir):
    from pgvector_db_spark.operators.ivf import IVFIndex
    from pgvector_db_spark.operators.knn import knn_batch
    from pgvector_db_spark.queries import _ivf_cache

    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    path = _ivf_cache(spark, sf_dir, emb)
    idx = IVFIndex(spark, path, "embedding", "vec_id")
    vq = emb.filter(F.pmod(F.col("vec_id"), F.lit(64)) == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = phase(
        "knn_batch exact (checkpoint)",
        lambda: knn_batch(
            idx._data(), vq, 10, vec_col="embedding", id_col="vec_id",
            metric=idx.metric,
        ).localCheckpoint(eager=True),
    )
    curve = phase(
        "autoprobe_curve (checkpoint)",
        lambda: idx.autoprobe_curve(vq, 10, exact=exact).localCheckpoint(eager=True),
    )
    out = idx.autoprobe(vq, k=10, target_recall_micro=450_000)
    phase("full autoprobe (count)", lambda: out.count())


def prof_bm25(spark, sf_dir):
    from pgvector_db_spark.operators.text_search import bm25_topk, tokens_col

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    terms = ["spark", "vector", "index"]
    srow_df = docs.select(tokens_col(F.col("text")).alias("_toks")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("_toks")).alias("sum_dl"),
        *[
            F.sum(F.array_contains("_toks", tm).cast("bigint")).alias(f"_df_{i}")
            for i, tm in enumerate(terms)
        ],
    )
    phase("stats pass (first)", lambda: srow_df.first())
    out = bm25_topk(docs, terms, k=20)
    phase("full bm25_topk (collect)", lambda: out.collect())


def prof_batch_ann(spark, sf_dir):
    from pgvector_db_spark.operators.ivf import IVFIndex
    from pgvector_db_spark.queries import _ivf_cache

    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    path = _ivf_cache(spark, sf_dir, emb)
    idx = IVFIndex(spark, path, "embedding", "vec_id")
    n_emb = emb.count()
    reps = max(1, 100_000 // n_emb)
    queries = (
        emb.crossJoin(spark.range(reps).withColumnRenamed("id", "_rep"))
        .selectExpr(f"vec_id * {reps} + _rep AS query_id", "embedding AS query_vec")
    )
    probe = idx._probe_table_distributed(queries, 1, "query_id", "query_vec")
    phase("probe table (noop)", lambda: noop(probe))
    out = idx.batch_search(queries, k=10, nprobe=1, mode="distributed")
    for i in range(3):
        phase(f"full batch_search rep{i} (count)", lambda: out.count())


def prof_cc(spark, sf_dir):
    from pgvector_db_spark.operators.dedup import (
        connected_components,
        prefix_filter_jaccard_pairs,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    from pyspark.sql.window import Window as W

    rep_map = docs.select(
        "doc_id",
        F.min("doc_id").over(W.partitionBy(F.md5(F.col("text")))).alias("rep_id"),
    )
    reps = docs.join(
        rep_map.filter(F.col("doc_id") == F.col("rep_id")).select("doc_id"),
        "doc_id",
    )
    pairs = phase(
        "prefix pairs (materialized)",
        lambda: prefix_filter_jaccard_pairs(reps, n=3, tau_num=3, tau_den=5),
    )
    comp = phase("connected_components", lambda: connected_components(pairs))
    phase("labels count", lambda: comp.count())


def main():
    target = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("profile")
    t0 = time.time()
    {
        "bpe": prof_bpe,
        "prefix": prof_prefix,
        "pagerank": prof_pagerank,
        "autoprobe": prof_autoprobe,
        "bm25": prof_bm25,
        "batch_ann": prof_batch_ann,
        "cc": prof_cc,
    }[target](spark, sf_dir)
    print(f"TOTAL {target}: {time.time() - t0:.3f}s")


if __name__ == "__main__":
    main()
