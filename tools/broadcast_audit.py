"""Audit: every force-broadcast site carries an explicit size bound.

VERDICT r6 ask #5: a bare ``F.broadcast(`` on a data-dependent relation
is correct at test scale and a driver-OOM at a true 100 TB catalog.
This tool enforces the repo convention that EVERY ``F.broadcast(`` call
site in the package is annotated with a one-line bound classification —
a ``# bcast: <class>[(bound)] <note>`` comment on the same line or one
of the three lines above — and reports the classification census.

Classes:
  const  — size fixed by the schema/algorithm, independent of data
           scale (nation=25, region=5, a 1-row scalar agg, a k-row
           threshold table, an n_buckets offset table).
  model  — size of a trained/derived model artifact (codebook,
           centroids, vocab top-k, per-class priors): grows with model
           config, not with the fact table.
  gated  — the call is inside (or routed through)
           operators.relational.size_gated_broadcast, which applies
           the hint only under a caller-supplied row bound.
  delta  — bounded by an incremental batch contract (daily delta,
           alert batch): documented as small by pipeline design.

``size_gated_broadcast``'s own internal F.broadcast is the gate itself
and is exempt. Exit 1 if any site is missing an annotation (CI-able).

Usage: python tools/broadcast_audit.py [--json]
"""

from __future__ import annotations

import json
import os
import re
import sys

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "covid_data_pipeline_spark",
)

ANNOT = re.compile(r"#\s*bcast:\s*(const|model|gated|delta)\b(.*)")
SITE = re.compile(r"F\.broadcast\(")


def main() -> int:
    sites: list[dict] = []
    missing: list[str] = []
    census: dict[str, int] = {"const": 0, "model": 0, "gated": 0, "delta": 0}
    for root, _dirs, files in os.walk(PKG):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, os.path.dirname(PKG))
            lines = open(path).read().splitlines()
            for i, line in enumerate(lines):
                if (
                    "size_gated_broadcast(" in line
                    and "def size_gated_broadcast" not in line
                    and fn != "relational.py"
                ):
                    census["gated"] += 1
                    sites.append(
                        {"site": f"{rel}:{i + 1}", "class": "gated",
                         "note": line.strip()[:80]}
                    )
                if not SITE.search(line):
                    continue
                if "def size_gated_broadcast" in "".join(
                    lines[max(0, i - 20): i]
                ) and "return F.broadcast(df)" in line:
                    continue  # the gate's own hint
                m = None
                for j in range(i, max(-1, i - 4), -1):
                    m = ANNOT.search(lines[j])
                    if m:
                        break
                loc = f"{rel}:{i + 1}"
                if m:
                    cls = m.group(1)
                    census[cls] += 1
                    sites.append(
                        {"site": loc, "class": cls,
                         "note": m.group(2).strip()}
                    )
                else:
                    missing.append(loc)
    report = {
        "sites": len(sites) + len(missing),
        "census": census,
        "missing": missing,
    }
    if "--json" in sys.argv:
        report["annotated"] = sites
        print(json.dumps(report, indent=1))
    else:
        print(json.dumps(report, indent=1))
    return 1 if missing else 0


if __name__ == "__main__":
    sys.exit(main())
