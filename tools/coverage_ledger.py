"""Mechanically-checkable window-rotation ledger.

Reads every committed CORRECTNESS*_r*.json artifact plus the registry
and emits, per registry entry, the latest driver round with a green row
(rows+schema+hash all true), the latest FULL-sweep round, and a
combined "freshest green evidence" column.  The r4 verdict asked for
exactly this: the per-entry bookkeeping used to live in registry
comments, where rotation claims could not be checked mechanically.

Usage:
    python tools/coverage_ledger.py            # table to stdout
    python tools/coverage_ledger.py --md       # markdown table
Exit code 1 if any registry entry has NO green evidence anywhere.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _green(row: dict) -> bool:
    return bool(
        row.get("rows_match") and row.get("schema_match") and row.get("hash_match")
    ) and not row.get("err")


def load_evidence() -> tuple[dict[str, int], dict[str, int]]:
    """Return ({name: latest green DRIVER round}, {name: latest green FULL round})."""
    driver: dict[str, int] = {}
    full: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS*_r*.json"))):
        m = re.search(r"_r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        is_full = "FULL" in os.path.basename(path)
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if _green(row):
                tgt = full if is_full else driver
                tgt[name] = max(tgt.get(name, 0), rnd)
    return driver, full


def load_ladder_evidence() -> dict[str, tuple[int, int]]:
    """Return {name: (latest round with scale-ladder evidence, factor)}.

    A row counts as laddered when some committed r*_scale*.json carries
    BOTH the sf0.1 baseline and a scaled (sf0.1xN) measurement for it —
    the r9 verdict's ask: make "never-laddered" enumerable instead of
    greppable, so the superlinear-row census (the r9 batch6 find: five
    35x rows hiding in the never-scaled tail) can be run to completion
    mechanically."""
    ladder: dict[str, tuple[int, int]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "tools/evidence/r*_scale*.json"))):
        m = re.match(r"r(\d+)_", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        factor = data.get("factor") or 0
        for name, row in data.get("queries", {}).items():
            # BOTH the sf0.1 baseline and a scaled measurement must be
            # present — a scaled-only partial batch has no ratio and
            # must not count as laddered (r10 review fix)
            if (
                isinstance(row, dict)
                and "sf0.1" in row
                and any(k.startswith("sf0.1x") for k in row)
            ):
                ladder[name] = max(ladder.get(name, (0, 0)), (rnd, factor))
    return ladder


def main() -> int:
    from etl_addresses_spark.registry import DRIVER_WINDOW, REGISTRY

    driver, full = load_evidence()
    ladder = load_ladder_evidence()
    md = "--md" in sys.argv
    rows = []
    never = []
    for name in REGISTRY:
        d = driver.get(name)
        fl = full.get(name)
        latest = max(x for x in (d, fl, 0) if x is not None)
        if latest == 0:
            never.append(name)
        lad = ladder.get(name)
        rows.append(
            (
                name,
                f"r{d:02d}" if d else "-",
                f"r{fl:02d}" if fl else "-",
                f"r{latest:02d}" if latest else "NEVER",
                "window" if name in DRIVER_WINDOW else "",
                f"r{lad[0]:02d}:{lad[1]}x" if lad else "-",
            )
        )
    rows.sort(key=lambda r: (r[3], r[0]))
    if md:
        print("| query | driver | full sweep | latest green | r-window | ladder |")
        print("|---|---|---|---|---|---|")
        for r in rows:
            print("| " + " | ".join(r) + " |")
    else:
        w = max(len(r[0]) for r in rows)
        print(f"{'query':<{w}}  driver  full  latest  window  ladder")
        for r in rows:
            print(
                f"{r[0]:<{w}}  {r[1]:>6}  {r[2]:>4}  {r[3]:>6}  {r[4]:<6}  {r[5]}"
            )
    stale = [r[0] for r in rows if r[3] != "NEVER" and int(r[3][1:]) <= 1]
    print(
        f"\n{len(rows)} registry entries; {len(never)} with no green evidence"
        f"{': ' + ', '.join(never) if never else ''}; "
        f"{len(stale)} with latest evidence r01 or older"
        f"{': ' + ', '.join(stale) if stale else ''}"
    )
    return 1 if never else 0


if __name__ == "__main__":
    raise SystemExit(main())
