"""Maintain VERIFIED.json — the rotation's code-change ledger.

For every registry entry with a green driver row in any
CORRECTNESS_r*.json, VERIFIED.json records the round of its LAST green
row and the md5 of the plan function's source AT THAT TIME. load_all()
compares that hash against the current source: a mismatch sorts the
entry into the never-verified group so the driver re-verifies it next
round instead of when its (now-stale) green row ages out of the
stalest-first queue.

RUN THIS AT ROUND START, BEFORE EDITING ANY PLAN: the tool can only
stamp the CURRENT source, so it must run while current == what the
driver verified last round. For an entry edited after its last driver
row (so its recorded hash should NOT be refreshed to current), pass
``--mark-changed NAME`` to pin a sentinel hash that always mismatches.

Usage:
    python tools/refresh_verified.py               # refresh stamps
    python tools/refresh_verified.py --mark-changed name1 name2 ...
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SENTINEL = "source-changed-after-last-driver-row"


def main() -> int:
    from mwa_uvdata_pipeline_spark import plans as P

    P.load_all()  # populate registry
    root = Path(__file__).resolve().parents[1]
    path = root / "VERIFIED.json"
    try:
        verified = json.loads(path.read_text())
    except (OSError, ValueError):
        verified = {}

    args = sys.argv[1:]
    marks: list[str] = []
    if args and args[0] == "--mark-changed":
        marks = args[1:]
        unknown = [m for m in marks if m not in P.PLANS]
        if unknown:
            print(f"unknown entries: {unknown}", file=sys.stderr)
            return 2
        for m in marks:
            verified[m] = {
                "round": verified.get(m, {}).get("round", 0),
                "src": SENTINEL,
            }
        path.write_text(json.dumps(verified, indent=1, sort_keys=True))
        print(f"marked changed: {len(marks)}")
        return 0

    last = P._last_verified_round()
    n_new = n_bump = 0
    for name, rnd in sorted(last.items()):
        if name not in P.PLANS:
            continue  # renamed/retired entry; keep any old record
        rec = verified.get(name)
        if rec is None:
            verified[name] = {"round": rnd, "src": P.plan_src_hash(P.PLANS[name])}
            n_new += 1
        elif rnd > rec.get("round", 0):
            # a newer green row exists: re-stamp with current source
            # (valid because this runs before any plan edit this round)
            verified[name] = {"round": rnd, "src": P.plan_src_hash(P.PLANS[name])}
            n_bump += 1
    path.write_text(json.dumps(verified, indent=1, sort_keys=True))
    print(
        f"VERIFIED.json: {len(verified)} entries "
        f"({n_new} new, {n_bump} re-stamped)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
