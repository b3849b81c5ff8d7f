"""Every force-broadcast site must carry its size-bound annotation
(VERDICT r6 ask #5 — the convention tools/broadcast_audit.py enforces).
A new F.broadcast( call without a `# bcast:` class comment (or a
size_gated_broadcast routing) fails here before it fails review."""

from __future__ import annotations

import json
import subprocess
import sys
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_no_unannotated_broadcast_sites():
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "broadcast_audit.py")],
        capture_output=True,
        text=True,
    )
    report = json.loads(out.stdout)
    assert report["missing"] == [], (
        "unannotated F.broadcast sites (add a '# bcast: const|model|delta"
        " <bound note>' comment or route through size_gated_broadcast): "
        f"{report['missing']}"
    )
    # the convention stays meaningful: every class present, sites > 100
    assert report["sites"] > 100
    assert report["census"]["gated"] >= 14
