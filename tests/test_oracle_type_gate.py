"""Full-registry result-TYPE gate (r8 VERDICT item #7).

The five-round r3-r7 driver red was never wrong arithmetic: a DuckDB
``SUM(BIGINT)`` oracle returned arrow ``decimal128(38,0)`` (HUGEINT)
against Spark's ``int64`` — equal values, different representations,
different driver hashes — and ``fetchall()``'s Python-int coercion hid
it locally. ``tools/difftest.py`` now type-checks the SAMPLED queries at
run time; this test closes the remaining window by checking EVERY
registered oracle's arrow schema against its Spark result schema at
sf0.001, so a dropped ``CAST(SUM(...) AS BIGINT)`` is a named local
test failure the day it is written.

Cost control: the Spark side only needs ``df.schema`` (no collect), and
the DuckDB side runs each oracle under ``LIMIT 0`` — planning is enough
to produce the arrow result schema.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from pgvector_db_spark.catalog import TABLES, table_path
from tests.conftest import SF_DIR
from tools.difftest import type_mismatches


@pytest.mark.slow
def test_every_oracle_arrow_schema_matches_spark(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(qs) >= set(oracles)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{table_path(SF_DIR, t)}'"
        )

    problems: list[str] = []
    unchecked: list[str] = []
    for name, fn in qs.items():
        if name not in oracles:
            unchecked.append(name)
            continue
        try:
            sschema = fn(spark, SF_DIR).schema
        except Exception as exc:  # a broken builder is difftest's finding,
            problems.append(f"{name}: spark builder error: {exc}")
            continue
        try:
            atbl = con.execute(
                f"SELECT * FROM ({oracles[name]}\n) _tg LIMIT 0"
            ).fetch_arrow_table()
        except Exception as exc:
            problems.append(f"{name}: duckdb error: {exc}")
            continue
        snames = sorted(f.name for f in sschema.fields)
        dnames = sorted(atbl.schema.names)
        if snames != dnames:
            problems.append(f"{name}: columns {snames} != {dnames}")
            continue
        bad = type_mismatches(sschema, atbl.schema)
        if bad:
            problems.append(f"{name}: {'; '.join(bad)}")

    assert not unchecked, f"oracle-less registry entries: {unchecked}"
    assert not problems, "result-type drift:\n" + "\n".join(problems)
