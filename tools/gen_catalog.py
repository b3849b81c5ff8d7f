"""Regenerate QUERIES.md: the driver-contract query catalog, grouped by
tag family, from the live registry. Run: ``python tools/gen_catalog.py``."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADER = """# QUERIES — the driver-contract catalog

Generated from `harness/registry.py` (`python tools/gen_catalog.py`).
Every row is a key in `__spark_entry__.py::queries()`; **oracle** rows
also appear in `oracle_sql()` and are value-hash-verified against DuckDB
at sf0.001 (tests/test_oracle_parity.py) and sf0.01 (driver); *rows-only*
marks genuinely non-SQL-expressible operators (approximate ANN, sketch
state, fitted models). **bench** rows form `bench.py`'s headline set.
The first 50 registered queries (all oracle-backed, pinned by
`WINDOW_PRIORITY`) are the driver's verification window.
"""


def main() -> None:
    from covid_data_pipeline_spark.harness.registry import QUERIES

    families: dict[str, list] = {}
    for i, (name, spec) in enumerate(QUERIES.items()):
        fam = spec.tags[0] if spec.tags else "misc"
        families.setdefault(fam, []).append((i, name, spec))

    out = [HEADER]
    n_oracle = sum(1 for s in QUERIES.values() if s.oracle)
    n_bench = sum(1 for s in QUERIES.values() if s.bench)
    out.append(
        f"**{len(QUERIES)} queries** — {n_oracle} oracle-backed, "
        f"{len(QUERIES) - n_oracle} rows-only, {n_bench} benched.\n"
    )
    for fam in sorted(families):
        out.append(f"\n## {fam} ({len(families[fam])})\n")
        out.append("| # | query | check | bench | tags |")
        out.append("|---|---|---|---|---|")
        rows_only_notes = []
        for i, name, spec in families[fam]:
            check = "oracle" if spec.oracle else "rows-only"
            window = " (window)" if i < 50 else ""
            bench = "bench" if spec.bench else ""
            out.append(
                f"| {i} | `{name}` | {check}{window} | {bench} | "
                f"{', '.join(spec.tags[1:])} |"
            )
            if spec.oracle is None and spec.rows_only_reason:
                rows_only_notes.append(
                    f"- `{name}` — {spec.rows_only_reason}"
                )
        if rows_only_notes:
            out.append("\nRows-only justification:\n")
            out.extend(rows_only_notes)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "QUERIES.md",
    )
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote QUERIES.md ({len(QUERIES)} queries, {len(families)} families)")


if __name__ == "__main__":
    main()
