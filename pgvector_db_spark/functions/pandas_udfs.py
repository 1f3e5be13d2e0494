"""Scalar Arrow-vectorized pandas UDFs.

NOTE: deliberately NO ``from __future__ import annotations`` here —
``pandas_udf`` resolves the function's type hints at decoration time, and
postponed evaluation would turn them into strings it cannot inspect.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("bigint")
def n_tokens(s: pd.Series) -> pd.Series:
    """Whitespace token count, vectorized: pandas ``str.split()`` with no
    pattern splits on whitespace runs and ignores leading/trailing blanks,
    matching ``len(split(trim(text), '\\s+'))`` for non-empty text."""
    return s.str.split().str.len().astype("int64")
