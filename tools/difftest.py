"""Local differential harness mirroring the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same sf dir, then compares row count, column names, and values
(order-insensitive, columns sorted by name). Reports exact/bitwise float
agreement separately from tolerance-level agreement so float-determinism
regressions are visible before the driver sees them.

Usage: python tools/difftest.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from pgvector_db_spark import get_spark  # noqa: E402
from pgvector_db_spark.catalog import TABLES, table_path  # noqa: E402


# Allowed DuckDB arrow result types per Spark column type (simpleString).
# The r7 driver gate stayed red for five rounds on queries whose VALUES
# were equal but whose oracle column was HUGEINT (SUM(BIGINT) ->
# decimal128(38,0) in arrow) while Spark returned int64: fetchall()'s
# Python-int coercion made that invisible locally (int == Decimal is
# True), while the driver's canonicalizer hashed the representations
# differently. This check makes type drift a named local failure.
_ARROW_OK = {
    "bigint": {"int64"},
    "int": {"int32"},
    "smallint": {"int16"},
    "tinyint": {"int8"},
    "double": {"double", "float64"},
    "float": {"float", "float32"},
    "string": {"string", "large_string"},
    "boolean": {"bool"},
    "date": {"date32[day]"},
    "binary": {"binary", "large_binary"},
}


def type_mismatches(spark_schema, arrow_schema) -> list[str]:
    """Column-level Spark-vs-DuckDB(arrow) result-type disagreements."""
    duck = {f.name: str(f.type) for f in arrow_schema}
    bad = []
    for field in spark_schema.fields:
        st = field.dataType.simpleString()
        dt = duck.get(field.name)
        if dt is None:
            continue  # name mismatch is reported separately
        if st.startswith("decimal("):
            want = {"decimal128(" + st[8:-1].replace(",", ", ") + ")"}
        elif st.startswith("timestamp"):
            want = None if dt.startswith("timestamp") else set()
        elif st.startswith("array"):
            want = None if dt.startswith(("list", "large_list")) else set()
        else:
            want = _ARROW_OK.get(st)
        if want is None:
            continue
        if dt not in want:
            bad.append(f"{field.name}: spark={st} duck={dt}")
    return bad


def canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return val
    if isinstance(val, list):
        return tuple(canon(v) for v in val)
    return val


def rows_to_multiset(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(str(x) for x in t),
    )


def close_enough(a, b, rel=1e-9) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return a == b or math.isclose(a, b, rel_tol=rel, abs_tol=1e-12)
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        return all(close_enough(x, y, rel) for x, y in zip(a, b))
    return a == b


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("difftest")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_noracle = 0
    failures = []

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            sschema = sdf.schema
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(srows)} rows)")
            n_noracle += 1
            continue
        try:
            res = con.execute(oracles[name])
            atbl = res.fetch_arrow_table()
            dcols = atbl.schema.names
            drows = [
                tuple(d[c] for c in dcols) for d in atbl.to_pylist()
            ]
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            n_fail += 1
            failures.append(name)
            continue

        dt = time.time() - t0
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns {sorted(scols)} != {sorted(dcols)}")
            n_fail += 1
            failures.append(name)
            continue
        tbad = type_mismatches(sschema, atbl.schema)
        if tbad:
            print(f"FAIL {name}: result types differ: {'; '.join(tbad)}")
            n_fail += 1
            failures.append(name)
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount {len(srows)} != {len(drows)}")
            n_fail += 1
            failures.append(name)
            continue
        sm = rows_to_multiset(scols, srows)
        dm = rows_to_multiset(dcols, drows)
        if sm == dm:
            print(f"PASS {name}: {len(srows)} rows EXACT ({dt:.1f}s)")
            n_pass += 1
        elif all(close_enough(a, b) for a, b in zip(sm, dm)):
            print(f"WARN {name}: {len(srows)} rows CLOSE-not-exact ({dt:.1f}s)")
            for a, b in zip(sm, dm):
                if a != b:
                    print(f"   spark={a}\n   duck ={b}")
                    break
            n_fail += 1
            failures.append(name)
        else:
            print(f"FAIL {name}: values differ")
            for a, b in zip(sm, dm):
                if a != b:
                    print(f"   spark={a}\n   duck ={b}")
                    break
            n_fail += 1
            failures.append(name)

    print(
        f"\n{n_pass} exact-pass, {n_fail} fail, {n_noracle} no-oracle "
        f"of {len(qs) if not only else len(only)} queries"
    )
    if failures:
        print("failures:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
