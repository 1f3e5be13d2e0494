"""Re-measure individual (query, sf) cells of docs/SCALING.md in a solo
session and patch the table rows in place.

Host speed swings ±30% (documented since r7), and a multi-second hiccup
during a full `scaling_curve.py` regeneration can poison single cells
(median of 3 doesn't save a cell when the hiccup spans the reps — the
r8 naive_bayes 0.58x/4.33x anomaly, and r9's ks sf0.01 cell). Re-running
the WHOLE curve costs ~an hour of solo box time; this tool re-times only
the named queries (same discipline: 1 warm + median of N reps per sf,
sf1 decade where the query is in scaling_curve.HEAVY) and rewrites their
markdown rows.

Usage: python tools/scaling_remeasure.py query [query ...] [--reps N]
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pgvector_db_spark import get_spark  # noqa: E402
from pgvector_db_spark.queries import REGISTRY  # noqa: E402
from tools.scaling_curve import (  # noqa: E402
    HEAVY,
    SF1,
    SFS,
    _time,
    lint_cells,
)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1] if "=" in a else sys.argv[
                sys.argv.index(a) + 1
            ])
    if not args:
        print(__doc__)
        return
    out = Path(__file__).resolve().parent.parent / "docs" / "SCALING.md"
    text = out.read_text()
    spark = get_spark("scaling_remeasure")
    have_sf1 = os.path.exists(os.path.join(SF1, "_DERIVED_OK"))
    for name in args:
        fn = REGISTRY[name].spark_fn
        ms = [round(_time(fn, spark, sf, reps) * 1000, 1) for sf in SFS]
        growth = round(ms[2] / ms[1], 2) if ms[1] else float("nan")
        if have_sf1 and name in HEAVY:
            ms1 = round(_time(fn, spark, SF1, reps) * 1000, 1)
            growth1 = round(ms1 / ms[2], 2) if ms[2] else float("nan")
            row = (
                f"| {name} | {ms[0]} | {ms[1]} | {ms[2]} | {ms1} "
                f"| {growth}x | {growth1}x |"
            )
        else:
            row = (
                f"| {name} | {ms[0]} | {ms[1]} | {ms[2]} | — "
                f"| {growth}x | — |"
            )
        cells = [*ms, ms1] if (have_sf1 and name in HEAVY) else [*ms, None]
        for fl in lint_cells(name, cells):
            print(f"LINT {fl} (cell NOT trusted; row patched anyway)")
        pat = re.compile(rf"^\| {re.escape(name)} \|.*$", re.M)
        if not pat.search(text):
            # new query: insert after the LAST table row, not at EOF
            # (the notes section follows the table)
            rows = list(re.finditer(r"^\|.*\|$", text, re.M))
            end = rows[-1].end()
            text = text[:end] + "\n" + row + text[end:]
            print(f"(new row for {name} inserted into the table)")
        else:
            text = pat.sub(row, text)
        print(row, flush=True)
    text = _relint(text)
    out.write_text(text)
    print(f"patched {out}")


def _relint(text: str) -> str:
    """Regenerate the '## Monotonicity lint' section from the CURRENT
    table rows — a remeasured (now-clean) cell must clear its stale
    flag, and a still-bad cell must stay flagged."""
    flags: list[str] = []
    for m in re.finditer(
        r"^\| (\w+) \| ([\d.]+) \| ([\d.]+) \| ([\d.]+) \| ([\d.]+|—) \|",
        text,
        re.M,
    ):
        name = m.group(1)
        cells = [
            float(m.group(2)),
            float(m.group(3)),
            float(m.group(4)),
            float(m.group(5)) if m.group(5) != "—" else None,
        ]
        flags += lint_cells(name, cells)
    head, sep, _ = text.partition("## Monotonicity lint")
    if not sep:
        return text
    body = (
        "\n".join(f"- FLAGGED: {fl}" for fl in flags)
        if flags
        else (
            "All cells plausible (no smaller scale exceeded 2x the next "
            "scale's time)."
        )
    )
    return head + "## Monotonicity lint\n\n" + body + "\n"


if __name__ == "__main__":
    main()
