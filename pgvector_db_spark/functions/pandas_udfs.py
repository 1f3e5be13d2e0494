"""Scalar pandas UDFs and Python UDTFs, built lazily.

Two deliberate deviations from the package norms here:
  - NO ``from __future__ import annotations``: ``pandas_udf`` resolves the
    function's type hints at decoration time, and postponed evaluation
    would turn them into strings it cannot inspect.
  - decoration happens inside factory functions, not at module scope:
    parsing the DDL return type requires an active SparkSession, and this
    module must stay importable before any session exists.
"""

import pandas as pd

_CACHE = {}


def n_tokens():
    """Whitespace token count, Arrow-vectorized: pandas ``str.split()``
    with no pattern splits on whitespace runs and ignores
    leading/trailing blanks, matching ``len(split(trim(text), '\\s+'))``
    for non-empty text."""
    if "n_tokens" not in _CACHE:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("bigint")
        def _n_tokens(s: pd.Series) -> pd.Series:
            return s.str.split().str.len().astype("int64")

        _CACHE["n_tokens"] = _n_tokens
    return _CACHE["n_tokens"]


def chunk_words_udtf():
    """Python UDTF (Spark 4): overlapping word-window chunker — one input
    document row expands to one row per chunk (width 32, stride 24),
    mirroring the pure-SQL chunker in queries.py ds_chunk_documents so
    the two implementations can be differentially checked."""
    if "chunk_words" not in _CACHE:
        from pyspark.sql.functions import udtf

        @udtf(returnType="chunk_idx int, n_words int, chunk_text string")
        class ChunkWordsUDTF:
            def eval(self, text):
                if text is None:
                    return
                words = text.split(" ")
                if not words:
                    return
                for idx, start in enumerate(range(0, len(words), 24)):
                    chunk = words[start : start + 32]
                    yield idx, len(chunk), " ".join(chunk)

        _CACHE["chunk_words"] = ChunkWordsUDTF
    return _CACHE["chunk_words"]
