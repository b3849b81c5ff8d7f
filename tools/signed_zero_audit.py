"""Audit: which queries' final float columns are sign-capable?

A float column that can go negative can also round to IEEE -0.0, which
DuckDB's ROUND preserves and Spark normalizes — a representation-level
driver-hash mismatch on a numerically perfect query (round-5
`embedding_standardize`). This tool runs every oracle at the given SF in
DuckDB only (fast; no Spark) and reports, per query, float columns where
any value is negative OR an actual -0.0 already occurs. Those columns
must be routed through `functions.scalar.round_stable` on the Spark side
and `(ROUND(x, d) + 0)` on the oracle side.

Usage: python tools/signed_zero_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from covid_data_pipeline_spark.harness.oracle import run_oracle
from covid_data_pipeline_spark.harness.registry import QUERIES


def _is_neg_zero(v: float) -> bool:
    return v == 0.0 and math.copysign(1.0, v) < 0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # Per-query time budget: the quadratic verification baselines
    # (exact kNN/bitext all-pairs oracles) take tens of minutes in
    # DuckDB at sf0.1 and are already guarded — skip past the budget
    # rather than stalling the whole sweep.
    budget_s = float(os.environ.get("SZ_AUDIT_BUDGET_S", "60"))
    import threading
    import time as _time

    report: dict[str, dict] = {}
    for name, spec in QUERIES.items():
        if spec.oracle is None:
            continue
        box: dict = {}
        # Own the connection here so a budget overrun can be
        # interrupted — abandoning the daemon thread alone leaves the
        # DuckDB query burning CPU/memory for the rest of the sweep
        # and skews later per-query timings (r6 ADVICE).
        import duckdb

        con = duckdb.connect()

        def _run(sql=spec.oracle, con=con):
            try:
                box["res"] = run_oracle(sql, sf_dir, con=con)
            except Exception as e:  # noqa: BLE001
                box["err"] = str(e)[:200]

        t0 = _time.time()
        th = threading.Thread(target=_run, daemon=True)
        th.start()
        th.join(budget_s)
        if th.is_alive():
            con.interrupt()
            th.join(5.0)
            con.close()
            report[name] = {"skipped": f"> {budget_s}s budget"}
            print(f"# SKIP {name} (> {budget_s}s)", file=sys.stderr, flush=True)
            continue
        con.close()
        print(f"# {name} {round(_time.time() - t0, 1)}s",
              file=sys.stderr, flush=True)
        if "err" in box:
            report[name] = {"error": box["err"]}
            continue
        cols, rows = box["res"]
        flagged = {}
        for i, c in enumerate(cols):
            neg = negzero = 0
            for r in rows:
                v = r[i]
                if isinstance(v, float) and not math.isnan(v):
                    if _is_neg_zero(v):
                        negzero += 1
                    elif v < 0:
                        neg += 1
            if neg or negzero:
                flagged[c] = {"neg": neg, "neg_zero": negzero}
        if flagged:
            report[name] = flagged
    print(json.dumps(report, indent=1))
    nz = [n for n, f in report.items()
          if any(isinstance(v, dict) and v.get("neg_zero") for v in f.values())]
    print(f"# {len(report)} queries with signed float columns; "
          f"{len(nz)} with live -0.0 at this SF: {nz}", file=sys.stderr)


if __name__ == "__main__":
    main()
