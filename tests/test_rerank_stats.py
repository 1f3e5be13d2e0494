"""operators/rerank.py (cross-encoder second stage) and
operators/stats.py (distributed exact KS test)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pgvector_db_spark.operators.rerank import (
    DeterministicStubScorer,
    cross_encoder_rerank,
    fake_pair_score,
    fake_pair_score_duck_sql,
    fake_pair_score_py,
)
from pgvector_db_spark.operators.stats import (
    ks_two_sample,
    ks_two_sample_oracle_sql,
)

TERMS = ["vector", "join", "filter"]

DOCS = [
    (1, "vector search with a join and a filter pass"),
    (2, "no matching words at all here"),
    (3, "join join join"),  # repeated term must count once
    (4, "Vector FILTER mixed case"),
    (5, ""),  # empty text: overlap 0, tie still defined
    (6, "filter vector"),
]


@pytest.fixture(scope="module")
def cand(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_fake_score_three_spellings_agree(spark, cand):
    """Column expr == DuckDB SQL == pure Python, per row."""
    got = {
        int(r["doc_id"]): int(r["s"])
        for r in cand.select(
            "doc_id", fake_pair_score(TERMS, F.col("text")).alias("s")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in DOCS)
        + ") AS v(doc_id, text)"
    )
    duck = {
        int(i): int(s)
        for i, s in con.execute(
            f"SELECT doc_id, {fake_pair_score_duck_sql(TERMS, 'text')} FROM d"
        ).fetchall()
    }
    py = {i: fake_pair_score_py(TERMS, t) for i, t in DOCS}
    assert got == duck == py
    # semantic spot checks: overlap dominates the tiebreak
    assert py[1] // 10_000_000 == 3
    assert py[2] // 10_000_000 == 0
    assert py[3] // 10_000_000 == 1
    assert py[4] // 10_000_000 == 2  # lowercased text matches the terms
    assert py[6] // 10_000_000 == 2


def test_rerank_fake_vs_injected_bitwise(spark, cand):
    """The mapInPandas path with the stub scorer must equal the pure
    Catalyst fake path row-for-row (same micro grid)."""
    fake = cross_encoder_rerank(cand, TERMS, k=4).collect()

    def factory():
        return DeterministicStubScorer(TERMS)

    inj = cross_encoder_rerank(
        cand, TERMS, k=4, model="stub-t", model_factory=factory
    ).collect()
    assert [tuple(r) for r in fake] == [tuple(r) for r in inj]
    assert [r["rnk"] for r in fake] == [1, 2, 3, 4]
    assert fake[0]["doc_id"] == 1  # only 3-term overlap


def test_rerank_k_larger_than_candidates(spark, cand):
    out = cross_encoder_rerank(cand, TERMS, k=50).collect()
    assert len(out) == len(DOCS)
    scores = [r["ce_score"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_ks_matches_oracle_and_brute_force(spark):
    import random

    rng = random.Random(7)
    rows = [
        (float(rng.randint(0, 40)) / 4.0, "a" if i % 3 else "b")
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "value double, grp string")
    got = ks_two_sample(df, "value", "grp", "a", "b", partitions=8).first()
    # brute force
    a = sorted(v for v, g in rows if g == "a")
    b = sorted(v for v, g in rows if g == "b")
    pts = sorted(set(a + b))
    d_num = max(
        abs(
            sum(1 for x in a if x <= p) * len(b)
            - sum(1 for x in b if x <= p) * len(a)
        )
        for p in pts
    )
    assert (int(got["n1"]), int(got["n2"]), int(got["d_num"])) == (
        len(a),
        len(b),
        d_num,
    )
    # oracle spelling agrees bit-for-bit including the micro grid
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e AS SELECT * FROM (VALUES "
        + ", ".join(f"({v!r}, '{g}')" for v, g in rows)
        + ") AS t(value, grp)"
    )
    sql = ks_two_sample_oracle_sql(
        "value", "grp", "'a'", "'b'", "FROM e WHERE value IS NOT NULL"
    )
    n1, n2, dn, dm = con.execute(sql).fetchone()
    assert (int(n1), int(n2), int(dn), int(dm)) == (
        int(got["n1"]),
        int(got["n2"]),
        int(got["d_num"]),
        int(got["d_micro"]),
    )


def test_ks_identical_samples_zero(spark):
    rows = [(float(v), g) for v in range(50) for g in ("a", "b")]
    df = spark.createDataFrame(rows, "value double, grp string")
    got = ks_two_sample(df, "value", "grp", "a", "b", partitions=4).first()
    assert int(got["d_num"]) == 0 and int(got["d_micro"]) == 0


def test_ks_empty_sample_raises(spark):
    df = spark.createDataFrame([(1.0, "a")], "value double, grp string")
    with pytest.raises(ValueError, match="empty sample"):
        ks_two_sample(df, "value", "grp", "a", "b")


def test_binned_ks_equals_raw_ks_on_integer_values(spark):
    """When values are already integers, binning at width 1 must give
    the identical statistic to the raw two-pass form."""
    import random

    from pgvector_db_spark.operators.stats import binned_ks

    rng = random.Random(11)
    rows = [
        (float(rng.randint(0, 30)), "a" if rng.random() < 0.6 else "b")
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "value double, grp string")
    raw = ks_two_sample(df, "value", "grp", "a", "b", partitions=8).first()
    hist = (
        df.groupBy(F.col("value").cast("bigint").alias("bin"))
        .agg(
            F.sum(F.when(F.col("grp") == "a", 1).otherwise(0))
            .cast("bigint")
            .alias("c1"),
            F.sum(F.when(F.col("grp") == "b", 1).otherwise(0))
            .cast("bigint")
            .alias("c2"),
        )
    )
    binned = binned_ks(hist).first()
    assert tuple(raw) == tuple(binned)


def test_mann_whitney_matches_brute_force_and_oracle(spark):
    import random

    from pgvector_db_spark.operators.stats import (
        mann_whitney_oracle_sql,
        mann_whitney_u,
    )

    rng = random.Random(3)
    rows = [
        (float(rng.randint(0, 25)) / 2.0, "a" if rng.random() < 0.5 else "b")
        for _ in range(250)
    ]
    df = spark.createDataFrame(rows, "value double, grp string")
    got = mann_whitney_u(df, "value", "grp", "a", "b", partitions=8).first()
    # brute force with midranks
    pooled = sorted((v, g) for v, g in rows)
    vals = [v for v, _ in pooled]
    two_r1 = 0
    for idx, (v, g) in enumerate(pooled):
        if g != "a":
            continue
        lo = vals.index(v)  # first index of the tie block
        hi = len(vals) - vals[::-1].index(v)  # one past last
        two_r1 += (lo + 1) + hi  # 2 * midrank = (lo+1 + hi)
    n1 = sum(1 for _, g in rows if g == "a")
    n2 = len(rows) - n1
    assert int(got["two_u1"]) == two_r1 - n1 * (n1 + 1)
    assert (int(got["n1"]), int(got["n2"])) == (n1, n2)
    # oracle bit parity including auc_micro
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e AS SELECT * FROM (VALUES "
        + ", ".join(f"({v!r}, '{g}')" for v, g in rows)
        + ") AS t(value, grp)"
    )
    sql = mann_whitney_oracle_sql(
        "value", "grp", "'a'", "'b'", "FROM e WHERE value IS NOT NULL"
    )
    assert tuple(int(x) for x in con.execute(sql).fetchone()) == tuple(
        int(x) for x in got
    )


def test_mann_whitney_auc_half_for_identical(spark):
    from pgvector_db_spark.operators.stats import mann_whitney_u

    rows = [(float(v), g) for v in range(40) for g in ("a", "b")]
    df = spark.createDataFrame(rows, "value double, grp string")
    got = mann_whitney_u(df, "value", "grp", "a", "b", partitions=4).first()
    assert int(got["auc_micro"]) == 500000


def test_pca_power_matches_pure_python_and_eigh(spark):
    """vs_pca_power_projection: (1) the SQL pipeline equals a pure-
    Python recompute performing the SAME ops in the SAME order, bitwise;
    (2) the 3-iteration power vector is directionally close to numpy's
    exact top eigenvector (accuracy, at tolerance)."""
    import math

    import numpy as np

    from pgvector_db_spark.queries import REGISTRY

    sf_dir = "/root/testdata/sf0.001"
    rows = REGISTRY["vs_pca_power_projection"].spark_fn(spark, sf_dir).collect()

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    dim = 8
    g = {
        int(r["vec_id"]): [
            math.floor(float(x) * 1e6 + 0.5) for x in r["embedding"][:dim]
        ]
        for r in emb
    }
    labels = {int(r["vec_id"]): int(r["label"]) for r in emb}
    n = len(g)
    s = [sum(v[a] for v in g.values()) for a in range(dim)]
    p = [
        [sum(v[a] * v[b] for v in g.values()) for b in range(dim)]
        for a in range(dim)
    ]
    cov = [
        [
            (float(p[min(a, b)][max(a, b)]) - float(s[a]) * float(s[b]) / float(n))
            / float(n)
            for b in range(dim)
        ]
        for a in range(dim)
    ]

    def _chain_sum(terms):
        acc = terms[0]
        for t in terms[1:]:
            acc = acc + t
        return acc

    v = [1.0] * dim
    for _ in range(3):
        u = [_chain_sum([cov[a][b] * v[b] for b in range(dim)]) for a in range(dim)]
        nv = math.sqrt(_chain_sum([u[a] * u[a] for a in range(dim)]))
        v = [u[a] / nv for a in range(dim)]
    sg = -1.0 if v[0] < 0.0 else 1.0
    proj = sorted(
        (
            (
                vid,
                labels[vid],
                math.floor(sg * _chain_sum([v[a] * float(gv[a]) for a in range(dim)]) + 0.5),
            )
            for vid, gv in g.items()
        ),
        key=lambda r: (-r[2], r[0]),
    )[:20]
    assert [tuple(r) for r in rows] == [(a, b, c) for a, b, c in proj]

    # Accuracy properties. The md5-fake fixture embeddings are nearly
    # ISOTROPIC (no dominant eigendirection), so 3 power iterations
    # cannot single out the top eigenvector there — and no iteration
    # count could; that is a property of the data, not the operator.
    # What MUST hold on any data: the Rayleigh quotient of the iterate
    # does not decrease (power iteration's monotonicity).
    C = np.array(cov)

    def rq(x):
        x = np.array(x)
        return float(x @ C @ x / (x @ x))

    ones = [1.0] * dim
    assert rq(v) >= rq(ones) - 1e-9

    # On ANISOTROPIC data (a real dominant direction), 3 iterations of
    # the same algorithm recover the eigh top eigenvector:
    rng = np.random.default_rng(5)
    d = rng.normal(size=dim)
    d /= np.linalg.norm(d)
    X = np.outer(rng.normal(size=400) * 5.0, d) + rng.normal(
        size=(400, dim)
    ) * 0.3
    C2 = np.cov(X.T, bias=True)
    v2 = np.ones(dim)
    for _ in range(3):
        u = C2 @ v2
        v2 = u / np.linalg.norm(u)
    evals, evecs = np.linalg.eigh(C2)
    top = evecs[:, int(np.argmax(evals))]
    assert abs(float(top @ v2)) > 0.99


def test_bpe_greedy_fold_semantics_cross_engine(spark):
    """The greedy left-to-right merge fold: 'a a a' under merge (a,a)
    must become [aa, a] (non-overlapping, leftmost-first) — identical
    between the Spark aggregate() spelling and DuckDB list_reduce."""
    from pgvector_db_spark.catalog import _REGISTRY_CACHE
    from pgvector_db_spark.queries import _bpe_train_sql

    # this test REPLACES the 'documents' temp view — invalidate
    # load_tables' per-session registry cache afterwards so later tests
    # re-register the fixture views instead of trusting the stale cache
    corpora = [
        ["a a a", "b b"],  # odd run: greedy non-overlap
        ["x a b a b b", "a b"],  # interleaved
        ["solo"],  # no pairs in one doc
    ]
    try:
        for docs in corpora:
            df = spark.createDataFrame(
                [(i, t) for i, t in enumerate(docs)], "doc_id bigint, text string"
            )
            df.createOrReplaceTempView("documents")
            got = [tuple(r) for r in spark.sql(_bpe_train_sql("spark", rounds=2)).collect()]
            con = duckdb.connect()
            con.execute(
                "CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, '{t}')" for i, t in enumerate(docs))
                + ") AS v(doc_id, text)"
            )
            want = [tuple(r) for r in con.execute(_bpe_train_sql("duckdb", rounds=2)).fetchall()]
            assert got == want, f"docs={docs}: spark={got} duck={want}"
        # greedy property spot-check: 'a a a' has pairs (a,a)x2 > (b,b)x1;
        # the leftmost-first non-overlapping re-encode leaves
        # 'aa a' + 'b b' = 4 tokens
        df = spark.createDataFrame([(0, "a a a"), (1, "b b")], "doc_id bigint, text string")
        df.createOrReplaceTempView("documents")
        rows = spark.sql(_bpe_train_sql("spark", rounds=1)).collect()
        assert (rows[0]["left_tok"], rows[0]["right_tok"]) == ("a", "a")
        assert int(rows[0]["pair_count"]) == 2
        assert int(rows[0]["n_tokens_after"]) == 4
    finally:
        spark.catalog.dropTempView("documents")
        _REGISTRY_CACHE.pop(id(spark), None)


def test_binned_ks_empty_side_raises(spark):
    from pgvector_db_spark.operators.stats import binned_ks

    hist = spark.createDataFrame(
        [(0, 5, 0), (1, 3, 0)], "bin bigint, c1 bigint, c2 bigint"
    )
    with pytest.raises(ValueError, match="empty sample"):
        binned_ks(hist)


def test_pca_moments_fold_associative(spark):
    """Streaming-PCA correctness hinges on moment additivity: the
    cell-wise sum of per-half moment rows must equal the whole-corpus
    moments exactly (integers, no rounding)."""
    from pgvector_db_spark.operators.pca import pca_moments

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    whole = pca_moments(emb).head()
    h1 = pca_moments(emb.filter("vec_id % 2 = 0")).head()
    h2 = pca_moments(emb.filter("vec_id % 2 = 1")).head()
    for c in whole.asDict():
        assert int(whole[c]) == int(h1[c]) + int(h2[c]), c


def test_roc_points_match_brute_force(spark):
    """Brute-force recompute of every decile operating point: same
    threshold pick (smallest v with 10*(i+j) >= q*n), same predict-
    positive-above-threshold confusion counts."""
    import math
    import random

    from pgvector_db_spark.operators.stats import roc_curve_points

    rng = random.Random(11)
    rows = [
        (float(rng.randint(0, 30)) / 3.0, "neg" if i % 3 else "pos")
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "value double, grp string")
    got = {
        r["q"]: r.asDict()
        for r in roc_curve_points(
            df, "value", "grp", "neg", "pos", partitions=8
        ).collect()
    }
    neg = sorted(v for v, g in rows if g == "neg")
    pos = sorted(v for v, g in rows if g == "pos")
    n1, n2, n = len(neg), len(pos), len(rows)
    vals = sorted(set(neg + pos))
    for q in range(1, 10):
        thr = next(
            v
            for v in vals
            if 10
            * (
                sum(1 for x in neg if x <= v)
                + sum(1 for x in pos if x <= v)
            )
            >= q * n
        )
        i = sum(1 for x in neg if x <= thr)
        j = sum(1 for x in pos if x <= thr)
        tp, fp, tn, fn = n2 - j, n1 - i, i, j
        g = got[q]
        assert (g["thr"], g["tp"], g["fp"], g["tn"], g["fn"]) == (
            thr,
            tp,
            fp,
            tn,
            fn,
        ), q
        assert g["tpr_micro"] == int(
            math.floor(tp / float(n2) * 1e6 + 0.5)
        )
    # curve invariants: thresholds rise, tpr/fpr fall, totals conserved
    qs = sorted(got)
    thrs = [got[q]["thr"] for q in qs]
    assert thrs == sorted(thrs)
    tprs = [got[q]["tpr_micro"] for q in qs]
    fprs = [got[q]["fpr_micro"] for q in qs]
    assert tprs == sorted(tprs, reverse=True)
    assert fprs == sorted(fprs, reverse=True)
    assert all(got[q]["tp"] + got[q]["fn"] == n2 for q in qs)
    assert all(got[q]["fp"] + got[q]["tn"] == n1 for q in qs)


def test_welch_ttest_matches_brute_force(spark):
    """rel_welch_ttest must equal a pure-Python Welch recompute from the
    raw values — same cent-grid integer moments, same IEEE op order for
    mean/variance/t/df."""
    import math

    from pgvector_db_spark.catalog import load_tables
    from pgvector_db_spark.queries import REGISTRY
    from tests.conftest import SF_DIR

    row = REGISTRY["rel_welch_ttest"].spark_fn(spark, SF_DIR).first()

    vals = {
        "click": [],
        "purchase": [],
    }
    for r in (
        load_tables(spark, SF_DIR)["events"]
        .select("event_type", "value")
        .where("value IS NOT NULL AND event_type IN ('click','purchase')")
        .collect()
    ):
        vals[r["event_type"]].append(
            int(math.floor(r["value"] * 100.0 + 0.5))
        )

    def moments(vs):
        n = len(vs)
        s = sum(vs)
        q = sum(v * v for v in vs)
        m = float(s) / (float(n) * 100.0)
        var = float(n * q - s * s) / (float(n) * float(n - 1) * 10000.0)
        return n, m, var

    n1, m1, v1 = moments(vals["click"])
    n2, m2, v2 = moments(vals["purchase"])
    se2 = v1 / float(n1) + v2 / float(n2)
    t = (m1 - m2) / math.sqrt(se2)
    df = (se2 * se2) / (
        (v1 / float(n1)) * (v1 / float(n1)) / float(n1 - 1)
        + (v2 / float(n2)) * (v2 / float(n2)) / float(n2 - 1)
    )
    assert row["n1"] == n1 and row["n2"] == n2
    assert row["mean_diff_micro"] == int(
        math.floor((m1 - m2) * 1000000.0 + 0.5)
    )
    assert row["t_micro"] == int(math.floor(t * 1000000.0 + 0.5))
    assert row["df_micro"] == int(math.floor(df * 1000000.0 + 0.5))
    # df is between min(n1,n2)-1 and n1+n2-2 (Welch-Satterthwaite bound)
    assert (min(n1, n2) - 1) * 10**6 <= row["df_micro"] <= (n1 + n2 - 2) * 10**6


def test_bpe_encode_consistent_with_trainer(spark):
    """The encoder's total post-merge token count must equal the
    trainer's round-4 n_tokens_after (same merges, same greedy fold),
    and merges applied must be non-negative and bounded by raw length."""
    from pgvector_db_spark.catalog import load_tables
    from pgvector_db_spark.queries import _bpe_encode_sql, _bpe_train_sql
    from tests.conftest import SF_DIR

    load_tables(spark, SF_DIR)
    train = {
        r["merge_no"]: r["n_tokens_after"]
        for r in spark.sql(_bpe_train_sql("spark")).collect()
    }
    enc = spark.sql(_bpe_encode_sql("spark")).collect()
    assert sum(r["n_tokens_bpe"] for r in enc) == train[4]
    assert all(
        0 <= r["n_merges_applied"] <= r["n_tokens_raw"] for r in enc
    )
    # greedy single-pair merge: one merge per round max per adjacency,
    # so per doc at most 4 rounds x floor(raw/2) merges
    assert all(
        r["n_tokens_bpe"] >= (r["n_tokens_raw"] + 1) // 2 - 3 for r in enc
    )


def test_kneser_ney_matches_hand_model(spark):
    """KN bigram scoring on a hand corpus must equal the closed-form
    model (exact integer ratios, ln via ln_bigint_py — the same bit
    pattern as both engines' trees)."""
    import math
    from fractions import Fraction

    from pgvector_db_spark.catalog import _REGISTRY_CACHE
    from pgvector_db_spark.functions.detmath import ln_bigint_py
    from pgvector_db_spark.queries import _kneser_ney_sql

    try:
        df = spark.createDataFrame(
            [(1, "a b a b c"), (2, "b c a")], "doc_id bigint, text string"
        )
        df.createOrReplaceTempView("documents")
        got = {
            r["doc_id"]: (r["n_bigrams"], r["ll_micro"])
            for r in spark.sql(_kneser_ney_sql("spark")).collect()
        }

        # model: c12 (a,b)=2 (b,a)=1 (b,c)=2 (c,a)=1; NT=4
        # num/den per type from ((4c12-3)NT + 3*n1l*n1r) / (4*c1*NT)
        nd = {
            ("a", "b"): (5 * 4 + 3 * 1 * 1, 4 * 2 * 4),
            ("b", "a"): (1 * 4 + 3 * 2 * 2, 4 * 3 * 4),
            ("b", "c"): (5 * 4 + 3 * 2 * 1, 4 * 3 * 4),
            ("c", "a"): (1 * 4 + 3 * 1 * 2, 4 * 1 * 4),
        }
        lnp = {
            k: int(
                math.floor(
                    (ln_bigint_py(num) - ln_bigint_py(den)) * 1e6 + 0.5
                )
            )
            for k, (num, den) in nd.items()
        }
        d1 = [("a", "b"), ("b", "a"), ("a", "b"), ("b", "c")]
        d2 = [("b", "c"), ("c", "a")]
        assert got[1] == (4, sum(lnp[p] for p in d1))
        assert got[2] == (2, sum(lnp[p] for p in d2))
        # KN invariant: observed-continuation mass per context < 1
        for w1, c1 in (("a", 2), ("b", 3), ("c", 1)):
            mass = sum(
                Fraction(num, den)
                for (a, _), (num, den) in nd.items()
                if a == w1
            )
            assert mass < 1
    finally:
        spark.catalog.dropTempView("documents")
        _REGISTRY_CACHE.pop(id(spark), None)
