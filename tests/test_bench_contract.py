"""bench.py driver contract: the printed line must always fit in the
external driver's ~2000-char stdout tail window (the r8 BENCH record
was lost to an oversized line), parse as JSON, and keep the required
fields, no matter how large the derived-metrics dict grows."""

from __future__ import annotations

import json

from bench import CORE_KEYS, MAX_LINE, compact_line, rep_ratio


def _out(derived):
    return {
        "metric": "headline_suite_sec",
        "value": 3.1415,
        "unit": "sec",
        "queries": {f"q{i}": 0.123 for i in range(9)},
        "sf": 0.1,
        "derived": derived,
    }


def test_compact_line_fits_window_and_parses():
    derived = {k: 123456.7 for k in CORE_KEYS}
    line = compact_line(_out(derived), derived)
    assert len(line) <= MAX_LINE
    d = json.loads(line)
    assert d["metric"] == "headline_suite_sec"
    assert d["unit"] == "sec"
    assert len(d["queries"]) == 9
    assert d["full"] == "bench_full.json"
    assert set(d["derived"]) <= set(CORE_KEYS)
    assert len(d["derived"]) > 10  # core metrics actually make it in


def test_compact_line_trims_pathological_derived():
    # adversarial: enormous dict AND enormous values — must still fit
    derived = {
        f"a_very_long_metric_name_number_{i:04d}_ms": 1e308 for i in range(500)
    }
    derived.update({k: 9.87654321e100 for k in CORE_KEYS})
    line = compact_line(_out(derived), derived)
    assert len(line) <= MAX_LINE
    json.loads(line)


def test_compact_line_survives_empty_derived():
    line = compact_line(_out({}), {})
    assert len(line) <= MAX_LINE
    assert json.loads(line)["derived"] == {}


def test_rep_ratio_excludes_warmup_rep():
    # rep 1 carries codegen warmup — a 5x-slower first rep must not
    # read as contention when the remaining reps agree
    assert rep_ratio([1.0, 0.20, 0.21]) == round(0.21 / 0.20, 3)
    # with only 2 reps there is no warmup to discard
    assert rep_ratio([0.5, 0.25]) == 2.0
    assert rep_ratio([0.0, 0.0, 0.0]) == 1.0


def test_compact_line_keeps_spread_but_strips_per_key_rep_fields():
    derived = {k: 1.0 for k in CORE_KEYS}
    out = _out(derived)
    out["reps"] = 3
    out["spread"] = 1.08
    out["rep_spread"] = {f"m{i}": 1.0 for i in range(200)}
    out["rep_times"] = {f"m{i}": [1.0, 2.0, 3.0] for i in range(200)}
    line = compact_line(out, derived)
    assert len(line) <= MAX_LINE
    d = json.loads(line)
    assert "rep_times" not in d and "rep_spread" not in d
    assert d["reps"] == 3 and d["spread"] == 1.08
