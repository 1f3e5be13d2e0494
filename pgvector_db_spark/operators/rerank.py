"""Cross-encoder reranking — the second stage of a production retrieval
stack (retrieve cheap & wide, rerank expensive & narrow).

The reference stops at first-stage retrieval (its demos rank by a single
vector distance, demo/aws_rds_similarity_search_demo.py:196-210); every
production RAG deployment of that stack adds a pairwise (query, doc)
scorer over the bounded candidate list. Spark-first shape:

- stage 1 is any existing distributed retriever (BM25 top-N, ANN top-N)
  — the corpus-scale work, already partition-parallel;
- stage 2 scores ONLY the |candidates| (query, text) pairs. The frame
  is bounded (N ≈ 50-1000), so even a heavyweight cross-encoder runs on
  N rows, never the corpus — at 100 TB the rerank cost is unchanged.

Two scorer paths, mirroring functions/embedding.py:

1. ``model='fake'`` — a deterministic pure-Catalyst pair score
   (query-term overlap in micro units + an md5 tiebreak), SQL-exact in
   the DuckDB oracle, JVM-side, codegen'd.
2. any other name — the REAL inference path: ``mapInPandas`` over the
   candidate frame with a per-executor scorer singleton exposing
   ``.predict(list[tuple[str, str]]) -> list[float]`` (the
   sentence-transformers ``CrossEncoder`` contract). ``model_factory``
   injects any implementation (deterministic stubs in tests); without
   it the loader import-gates sentence-transformers, which is not in
   this image.

Scores are stored on the exact 1e-6 grid (``ce_score = floor(raw * 1e6
+ 0.5)`` as BIGINT), so an injected integer-micro stub is bit-exactly
oracle-checkable while real float logits land in the same column type.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pgvector_db_spark.operators.text_search import _sql_str

#: fake score = overlap * _OVERLAP_UNITS + md5_tie, tie < _TIE_MOD —
#: one term of overlap always outranks any tiebreak difference.
_OVERLAP_UNITS = 10_000_000
_TIE_MOD = 1_000_000


def _fake_tokens(text: Column) -> Column:
    """split(trim(lower(text)), '\\s+') — the corpus tokenizer
    (text_search.tokens_col spelling), repeated here so the fake pair
    score is self-contained over any (id, text) candidate frame."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def fake_pair_score(query_terms: list[str], text: Column) -> Column:
    """Deterministic pair score of (fixed query, text) in micro units:
    ``overlap * 10_000_000 + (hex8(md5(text || '_ce')) % 1_000_000)``.
    Pure integer arithmetic over exact integer inputs — identical in
    the DuckDB oracle (:func:`fake_pair_score_duck_sql`) and in the
    pure-Python stub (:func:`fake_pair_score_py`)."""
    toks = _fake_tokens(text)
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError(
            "fake_pair_score: query_terms must be non-empty "
            "(matching _term_list's named error for the same input)"
        )
    overlap = None
    for t in terms:
        c = F.array_contains(toks, t).cast("bigint")
        overlap = c if overlap is None else overlap + c
    tie = (
        F.conv(F.substring(F.md5(F.concat(text, F.lit("_ce"))), 1, 8), 16, 10)
        .cast("bigint")
        % F.lit(_TIE_MOD)
    )
    return overlap * F.lit(_OVERLAP_UNITS) + tie


def fake_pair_score_duck_sql(query_terms: list[str], text_expr: str) -> str:
    """DuckDB spelling of :func:`fake_pair_score` (instr-sum hex8 — the
    registry's ``_duck_hex8`` idiom — equals int(hex, 16))."""
    terms = sorted(set(query_terms))
    toks = f"regexp_split_to_array(trim(lower({text_expr})), '\\s+')"
    overlap = " + ".join(
        f"CAST(list_contains({toks}, {_sql_str(t)}) AS BIGINT)" for t in terms
    )
    hex8 = " + ".join(
        f"instr('123456789abcdef', substr(md5({text_expr} || '_ce'), {j + 1}, 1))"
        f" * {16 ** (7 - j)}"
        for j in range(8)
    )
    return (
        f"(({overlap}) * {_OVERLAP_UNITS}"
        f" + CAST({hex8} AS BIGINT) % {_TIE_MOD})"
    )


def fake_pair_score_py(query_terms: list[str], text: str) -> int:
    """Pure-Python spelling (for injected stub scorers and tests).
    Tokenization mirrors Spark ``split(trim(lower(text)), '\\s+')``:
    trim strips ASCII spaces only; the split regex is ASCII ``\\s``."""
    import hashlib
    import re

    t = (text or "").strip(" ")
    toks = set(re.split(r"\s+", t.lower(), flags=re.ASCII))
    overlap = sum(1 for q in sorted(set(query_terms)) if q in toks)
    h = hashlib.md5((text + "_ce").encode("utf-8")).hexdigest()
    return overlap * _OVERLAP_UNITS + int(h[:8], 16) % _TIE_MOD


class DeterministicStubScorer:
    """Injected scorer computing :func:`fake_pair_score_py` — the
    ``CrossEncoder.predict`` contract with the network replaced by the
    SQL-exact formula, so the full mapInPandas path is oracle-checkable.
    Returns scores already divided onto the raw scale the micro grid
    re-quantizes exactly (n / 1e6 survives floor(x*1e6+0.5) round-trip
    for n < 2^52/1e6)."""

    def __init__(self, query_terms: list[str]):
        self._terms = list(query_terms)

    def predict(self, pairs):
        return [
            fake_pair_score_py(self._terms, text) / 1e6 for _, text in pairs
        ]


# per-executor-process scorer singletons (functions/embedding._load_model
# pattern; scorer objects are heavyweight for real cross-encoders)
_SCORER_CACHE: dict = {}


def _load_scorer(model_name: str, factory=None, cache_key: str | None = None):
    key = cache_key if cache_key is not None else model_name
    if key not in _SCORER_CACHE:
        if factory is not None:
            _SCORER_CACHE[key] = factory()
        else:
            try:
                from sentence_transformers import CrossEncoder  # type: ignore
            except ImportError as exc:  # pragma: no cover - heavy dep absent
                raise NotImplementedError(
                    "sentence-transformers is not installed in this "
                    "environment; use model='fake' or inject model_factory"
                ) from exc
            _SCORER_CACHE[key] = CrossEncoder(model_name)
    return _SCORER_CACHE[key]


def cross_encoder_rerank(
    candidates: DataFrame,
    query_terms: list[str],
    k: int = 10,
    model: str = "fake",
    model_factory=None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rerank a bounded candidate frame by a pairwise (query, doc)
    score. Returns ``(id_col, ce_score, rnk)`` — all BIGINT — ordered
    by ``(ce_score DESC, id ASC)``, top ``k``.

    ``candidates`` must be the bounded stage-1 result (top-N joined
    back to text); the scorer cost is O(N), corpus-size-independent.
    """
    query = " ".join(query_terms)
    if model == "fake":
        scored = candidates.select(
            F.col(id_col),
            fake_pair_score(query_terms, F.col(text_col)).alias("ce_score"),
        )
    else:
        cache_key = (
            f"{model}:{getattr(model_factory, '__qualname__', repr(model_factory))}"
            if model_factory is not None
            else None
        )

        def score(batches: Iterator) -> Iterator:
            import pandas as pd

            scorer = _load_scorer(model, model_factory, cache_key=cache_key)
            for pdf in batches:
                texts = pdf[text_col].fillna("").tolist()
                raw = scorer.predict([(query, t) for t in texts])
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "ce_score": [
                            int(math.floor(float(r) * 1e6 + 0.5)) for r in raw
                        ],
                    }
                )

        scored = candidates.select(id_col, text_col).mapInPandas(
            score, schema=f"{id_col} bigint, ce_score bigint"
        )
    # single global window over the BOUNDED candidate frame (N rows) —
    # the "No Partition Defined" shape is fine here by construction
    w = Window.orderBy(F.col("ce_score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .orderBy("rnk")
    )


def cross_encoder_oracle_sql(
    bm25_oracle: str, query_terms: list[str], k: int
) -> str:
    """DuckDB oracle for BM25-candidates → fake-cross-encoder rerank:
    the stage-1 oracle (any complete SELECT, e.g. ``bm25_oracle_sql(...,
    k=N)``) nested as the candidate subquery, then the identical fake
    pair score and (score DESC, id ASC) ROW_NUMBER tail."""
    ce = fake_pair_score_duck_sql(query_terms, "d.text")
    return f"""
    WITH cand AS (SELECT doc_id FROM ({bm25_oracle})),
    ce AS (
      SELECT d.doc_id, {ce} AS ce_score
      FROM documents d JOIN cand USING (doc_id)
    ),
    ranked AS (
      SELECT doc_id, ce_score,
             CAST(ROW_NUMBER() OVER (ORDER BY ce_score DESC, doc_id ASC)
                  AS BIGINT) AS rnk
      FROM ce
    )
    SELECT doc_id, ce_score, rnk FROM ranked
    WHERE rnk <= {k} ORDER BY rnk
    """
