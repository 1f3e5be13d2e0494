"""Property tests for the round-4 pipeline operators — invariants the
DuckDB oracle can't express (cross-run determinism, independent
recomputation with numpy/pandas)."""

from __future__ import annotations

import math
from collections import Counter

from pgvector_db_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _run(spark, name):
    return REGISTRY[name].spark_fn(spark, SF_DIR)


def test_source_cap_bounds_and_determinism(spark):
    rows = _run(spark, "ds_source_cap").collect()
    per_source = Counter(r["source"] for r in rows)
    assert per_source and all(n <= 10 for n in per_source.values())
    # every source in the fixture has >=10 docs, so the cap binds exactly
    assert all(n == 10 for n in per_source.values())
    again = _run(spark, "ds_source_cap").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_hard_negatives_never_share_query_label(spark):
    rows = _run(spark, "ds_hard_negative_mining").collect()
    assert len(rows) == 50  # 10 queries x 5 negatives
    assert all(r["neg_label"] != r["qlabel"] for r in rows)
    # ranks are 1..5 per query, similarity non-increasing within a query
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    for negs in by_q.values():
        negs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in negs] == [1, 2, 3, 4, 5]
        sims = [r["similarity"] for r in negs]
        assert all(a >= b for a, b in zip(sims, sims[1:]))


def test_knn_label_vote_is_majority_of_top5(spark):
    import numpy as np

    rows = {r["qid"]: r for r in _run(spark, "ds_knn_label_vote").collect()}
    emb = REGISTRY["vs_self_similarity"]  # just to assert registry intact
    assert emb is not None
    import duckdb

    con = duckdb.connect()
    data = con.execute(
        f"SELECT vec_id, label, embedding FROM '{SF_DIR}/embeddings.parquet'"
    ).fetchall()
    vecs = {v: (lab, np.asarray(e, dtype=np.float64)) for v, lab, e in data}
    for qid in list(rows)[:5]:
        qlab, qv = vecs[qid]
        qn = math.sqrt(float(qv @ qv))
        scored = []
        for v, (lab, x) in vecs.items():
            if v == qid:
                continue
            sim = float(qv @ x) / (qn * math.sqrt(float(x @ x)))
            scored.append((-sim, v, lab))
        scored.sort()
        top5 = [lab for _, _, lab in scored[:5]]
        counts = Counter(top5)
        best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
        assert rows[qid]["predicted_label"] == best[0]
        assert rows[qid]["n_votes"] == best[1]


def test_bpe_pair_total_consistency(spark):
    import duckdb

    rows = _run(spark, "ds_bpe_pair_counts").collect()
    assert len(rows) == 50
    counts = [r["n_occurrences"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    # the most frequent pair's count must match an independent recount
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT text FROM '{SF_DIR}/documents.parquet' WHERE length(trim(text)) > 0"
    ).fetchall()
    recount: Counter = Counter()
    for (text,) in docs:
        ws = text.strip().split()
        for a, b in zip(ws, ws[1:]):
            recount[f"{a} {b}"] += 1
    top = rows[0]
    assert recount[top["pair"]] == top["n_occurrences"]
    assert top["n_occurrences"] == max(recount.values())


def test_quality_percentile_keeps_top_quartile_per_lang(spark):
    import pandas as pd

    kept = _run(spark, "ds_quality_percentile_filter").toPandas()
    full = (
        _run(spark, "ds_text_quality")
        .toPandas()[["doc_id", "lang", "stopword_ratio"]]
    )
    full["micro"] = (full["stopword_ratio"] * 1e6 + 0.5).apply(math.floor)
    for lang, grp in full.groupby("lang"):
        n = len(grp)
        ranks = grp["micro"].rank(method="min")
        pr = (ranks - 1) / (n - 1)
        expect = set(grp.loc[pr >= 0.75, "doc_id"])
        got = set(kept.loc[kept["lang"] == lang, "doc_id"])
        assert got == expect, f"lang {lang}: {got ^ expect}"


def test_tfidf_recompute_one_doc(spark):
    import duckdb

    rows = _run(spark, "ds_tfidf_topk_terms").collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert all(len(v) <= 3 for v in by_doc.values())
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' "
        "WHERE length(trim(text)) > 0"
    ).fetchall()
    tf: dict[int, Counter] = {d: Counter(t.strip().lower().split()) for d, t in docs}
    df: Counter = Counter()
    for c in tf.values():
        df.update(c.keys())
    n_docs = len(docs)
    some_doc = docs[0][0]
    scored = sorted(
        (
            (-math.floor(c * math.log(n_docs / df[w]) * 1e6 + 0.5), w)
            for w, c in tf[some_doc].items()
        ),
    )[:3]
    got = sorted((-r["tfidf_micro"], r["term"]) for r in by_doc[some_doc])
    assert got == scored


def test_stream_quality_gate_matches_batch_gopher(spark):
    """The streamed keep-set must equal the batch Gopher filter's."""
    gopher = _run(spark, "ds_gopher_quality_filter").collect()
    n_keep_batch = sum(r["keep"] for r in gopher)
    streamed = _run(spark, "stream_quality_gated_ingest").collect()
    assert sum(r["n_kept"] for r in streamed) == n_keep_batch


def test_semdedup_keep_rule_recompute(spark):
    """SemDeDup semantics verified independently in numpy: a point is
    pruned iff SOME lower-id point in its cluster has cosine >= tau
    (the deterministic keep-lowest-id sweep, queries._semdedup_sql)."""
    import numpy as np

    from pgvector_db_spark.queries import _SEMDEDUP_TAU

    rows = _run(spark, "ds_semdedup_prune").collect()
    emb = {
        int(r["vec_id"]): np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }
    # every vector exactly once, both keep branches exercised
    assert sorted(int(r["vec_id"]) for r in rows) == sorted(emb)
    keeps = {int(r["keep"]) for r in rows}
    assert keeps == {0, 1}
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(int(r["cluster"]), []).append(r)
    for members in by_cluster.values():
        members.sort(key=lambda r: int(r["vec_id"]))
        for i, r in enumerate(members):
            v = emb[int(r["vec_id"])]
            has_lower_sim = any(
                float(
                    np.dot(v, emb[int(o["vec_id"])])
                    / (
                        np.linalg.norm(v)
                        * np.linalg.norm(emb[int(o["vec_id"])])
                    )
                )
                >= _SEMDEDUP_TAU - 1e-9
                for o in members[:i]
            )
            has_lower_sim_strict = any(
                float(
                    np.dot(v, emb[int(o["vec_id"])])
                    / (
                        np.linalg.norm(v)
                        * np.linalg.norm(emb[int(o["vec_id"])])
                    )
                )
                >= _SEMDEDUP_TAU + 1e-9
                for o in members[:i]
            )
            # numpy's fused reductions can differ from the engines'
            # sequential fold by ulps, so only assert outside a band
            # around the threshold: a strict hit must prune, a clear
            # miss must keep
            if has_lower_sim_strict:
                assert int(r["keep"]) == 0, r
            elif not has_lower_sim:
                assert int(r["keep"]) == 1, r


def test_naive_bayes_recompute_tiny_corpus(spark):
    """Independent pure-Python NB recompute on a hand corpus: train
    counts, Laplace-smoothed per-class log-likelihoods (ln_bigint_py,
    the same bit-pinned tree), argmax with the same (score desc, lang
    asc) tie-break — the SQL classifier must agree on every doc."""
    import math as m

    from pgvector_db_spark.functions.detmath import ln_bigint_py
    from pgvector_db_spark.queries import REGISTRY

    rows = [
        (0, "le chat noir dort", "fr"),
        (1, "the black cat sleeps", "en"),
        (2, "le chien mange bien", "fr"),
        (3, "the dog eats well", "en"),
        (4, "le chat mange", "fr"),
        (5, "the cat eats", "en"),
    ]
    docs = spark.createDataFrame(
        [(i, t, l, "s0", len(t)) for i, t, l in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    from pgvector_db_spark import catalog
    from pgvector_db_spark.queries import _naive_bayes_sql

    docs.createOrReplaceTempView("documents")
    try:
        out = {
            (r["true_lang"], r["pred_lang"]): r["n_docs"]
            for r in spark.sql(_naive_bayes_sql("spark")).collect()
        }
    finally:
        spark.catalog.dropTempView("documents")
        catalog._REGISTRY_CACHE.pop(id(spark), None)

    # pure-Python recompute
    toks = {i: t.split() for i, t, _ in rows}
    langs = sorted({l for _, _, l in rows})
    by_lang = {l: [] for l in langs}
    for i, t, l in rows:
        by_lang[l].extend(toks[i])
    vocab = {w for ws in toks.values() for w in ws}
    V, n_docs = len(vocab), len(rows)
    grid = lambda x: int(m.floor(x * 1e6 + 0.5))
    pred = {}
    for i, t, _ in rows:
        best = None
        for l in langs:
            cnt = Counter(by_lang[l])
            prior = grid(
                ln_bigint_py(sum(1 for r in rows if r[2] == l))
                - ln_bigint_py(n_docs)
            )
            num = sum(
                tf * grid(ln_bigint_py(cnt[w] + 1))
                for w, tf in Counter(toks[i]).items()
            )
            den = len(toks[i]) * grid(
                ln_bigint_py(len(by_lang[l]) + V)
            )
            score = prior + num - den
            if best is None or (score, ) > (best[0], ) or (
                score == best[0] and l < best[1]
            ):
                if best is None or score > best[0]:
                    best = (score, l)
        pred[i] = best[1]
    want = Counter((rows[i][2], pred[i]) for i in pred)
    assert out == dict(want)
    # and the classifier actually separates the two obvious languages
    assert all(t == p for (t, p) in out)


def test_curriculum_interleave_round_robin(spark):
    """The curriculum head must open with every source's rank-1 doc,
    walk ranks in non-decreasing order, and number positions 1..64."""
    from pgvector_db_spark.catalog import load_tables
    from pgvector_db_spark.queries import REGISTRY
    from tests.conftest import SF_DIR

    rows = sorted(
        REGISTRY["ds_curriculum_interleave"].spark_fn(spark, SF_DIR).collect(),
        key=lambda r: r["position"],
    )
    assert [r["position"] for r in rows] == list(range(1, 65))
    ranks = [r["rank_in_source"] for r in rows]
    assert ranks == sorted(ranks)
    n_sources = (
        load_tables(spark, SF_DIR)["documents"]
        .select("source")
        .distinct()
        .count()
    )
    assert [r["rank_in_source"] for r in rows[:n_sources]] == [1] * n_sources
    assert len({r["source"] for r in rows[:n_sources]}) == n_sources


def test_token_entropy_matches_pure_python(spark):
    """ds_token_entropy must equal a pure-Python recompute with the same
    driver-folded micro-grid logs (no engine transcendental anywhere)."""
    import math
    from collections import Counter

    from pgvector_db_spark.catalog import load_tables
    from pgvector_db_spark.functions.detmath import ln_bigint_py
    from pgvector_db_spark.queries import REGISTRY
    from tests.conftest import SF_DIR

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_distinct"], r["entropy_micro"])
        for r in REGISTRY["ds_token_entropy"].spark_fn(spark, SF_DIR).collect()
    }
    lnm = {
        m: int(math.floor(ln_bigint_py(m) * 1e6 + 0.5)) for m in range(1, 257)
    }
    docs = (
        load_tables(spark, SF_DIR)["documents"]
        .select("doc_id", "text")
        .collect()
    )
    checked = 0
    for r in docs:
        text = (r["text"] or "").strip()
        if not text:
            continue
        tf = Counter(text.split())
        L = sum(tf.values())
        acc = sum(c * (lnm[L] - lnm[c]) for c in tf.values())
        want = int(math.floor(float(acc) / float(L) + 0.5))
        assert got[r["doc_id"]] == (L, len(tf), want)
        checked += 1
    assert checked == len(got) > 0
    # uniform-token docs have zero entropy; entropy <= ln(L)
    for L, nd, e in got.values():
        assert 0 <= e <= lnm[L] + 1
        if nd == 1:
            assert e == 0


def test_bpe_fold_fast_equals_general_fold(spark):
    """r13: the O(tokens) re-encode used for l != r merges must equal
    the general O(tokens²) accumulator fold on every overlap edge case
    (adjacent matches, match at array start/end, singleton arrays,
    back-to-back pattern halves)."""
    from pgvector_db_spark.queries import _bpe_dialect, _bpe_fold_fast

    _, _, _, _, fold = _bpe_dialect("spark")
    rows = [
        (1, ["a", "b", "a", "b", "b"]),
        (2, ["a", "a", "b"]),
        (3, ["b", "a", "b"]),
        (4, ["a"]),
        (5, ["b", "b"]),
        (6, ["a", "b"]),
        (7, ["b", "a"]),
        (8, ["a", "b", "b", "a", "b", "a", "a", "b"]),
        (9, []),
    ]
    df = spark.createDataFrame(
        rows, "doc_id int, enc array<string>"
    ).localCheckpoint(eager=True)
    le, re_ = "'a'", "'b'"
    old = {
        r["doc_id"]: list(r["e"])
        for r in df.selectExpr(
            "doc_id", f"{fold('enc', le, re_)} AS e"
        ).collect()
    }
    new = {
        r["doc_id"]: list(r["e"])
        for r in df.selectExpr(
            "doc_id", f"{_bpe_fold_fast('enc', le, re_)} AS e"
        ).collect()
    }
    # the general fold maps [] -> [] via its empty-acc seed; the fast
    # path's filter(transform([])) is [] too
    assert old == new
