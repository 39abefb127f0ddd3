"""Per-entry BENCH bookkeeping — the timing analogue of
tools/coverage_ledger.py (r6 verdict item 3).

The correctness ledger answers "when was this entry last proven
right"; this one answers "when was this entry last TIMED", so a perf
regression in a rarely-benched row is visible as staleness instead of
silently waiting for a driver window.  Since r8 the table also carries
the PREVIOUS round's timing and the ratio — regression detection needs
a baseline pair (r7 verdict item 7) — and the registry tier, so
validation-class rows are never mistaken for production paths.  Since
r9 each timing is tagged with its harness source and the delta prefers
same-source pairs; a cross-source ratio (driver vs local — different
load/session conditions) is annotated with a trailing '~' rather than
presented as trustworthy (r8 advice).

Evidence sources, in round order:
  - BENCH_r{N}.json            driver bench artifacts (parsed.queries;
                               since r6 the final line carries only the
                               5 slowest — still timing evidence for
                               those 5)
  - tools/evidence/r{N}_bench*.json
                               committed local bench runs (bench.py
                               headline_detail emissions: a "queries"
                               dict of name -> seconds, with optional
                               "repeats"); the full-registry rotation
                               batches land here as
                               r{N}_bench_local_*.json

Usage:
    python tools/bench_ledger.py          # table to stdout
    python tools/bench_ledger.py --md     # markdown table
Exit code 1 if any registry entry has NO bench row anywhere.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _query_times(obj) -> dict[str, float]:
    """Extract {query: best seconds} from a bench emission of either
    shape (driver `parsed` dict or local headline_detail)."""
    out: dict[str, float] = {}
    if not isinstance(obj, dict):
        return out
    qs = obj.get("queries")
    if isinstance(qs, dict):
        for name, v in qs.items():
            if isinstance(v, (int, float)):
                out[name] = float(v)
            elif isinstance(v, list) and v:
                out[name] = float(min(v))
    reps = obj.get("repeats")
    if isinstance(reps, dict):
        for name, v in reps.items():
            if isinstance(v, list) and v:
                out.setdefault(name, float(min(v)))
    return out


def load_evidence() -> dict[str, dict[int, dict[str, float]]]:
    """{query: {round: {source: best sec}}} (min across artifacts of
    the same round AND source).  Source is 'driver' for the graded
    BENCH_r*.json artifacts and 'local' for committed bench.py runs
    under tools/evidence/ — kept separate because the two harnesses
    run under different load/session conditions, and a ratio across
    them can misread as a regression (r8 advice)."""
    history: dict[str, dict[int, dict[str, float]]] = {}

    def record(rnd: int, source: str, times: dict[str, float]) -> None:
        for name, sec in times.items():
            by_src = history.setdefault(name, {}).setdefault(rnd, {})
            by_src[source] = min(sec, by_src.get(source, sec))

    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        m = re.search(r"_r(\d+)", os.path.basename(path))
        if not m:
            continue
        try:
            artifact = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        record(int(m.group(1)), "driver", _query_times(artifact.get("parsed")))

    for path in sorted(
        glob.glob(os.path.join(REPO, "tools", "evidence", "r*_bench*.json"))
    ):
        m = re.match(r"r(\d+)_bench", os.path.basename(path))
        if not m:
            continue
        try:
            artifact = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        record(int(m.group(1)), "local", _query_times(artifact))
    return history


def main() -> int:
    from etl_addresses_spark.registry import REGISTRY

    history = load_evidence()
    md = "--md" in sys.argv
    rows = []
    missing = 0
    for name in sorted(REGISTRY):
        tier = REGISTRY[name].tier
        rounds = history.get(name, {})
        if rounds:
            latest = max(rounds)
            # A same-source pair from ANY source beats a cross-source
            # ratio — even when a different source holds the latest
            # round's fastest time (review fix: keying the pairing to
            # the fastest source discarded available trusted pairs).
            # Among same-source candidates prefer the most recent
            # prior round, then the faster current value; cur is
            # displayed from the PAIRED source so the ratio and the
            # sec column never mix harnesses.
            candidates = [
                (prev, rounds[latest][src], rounds[prev][src])
                for src in rounds[latest]
                for prev in rounds
                if prev < latest and src in rounds[prev]
            ]
            if candidates:
                prev, cur_val, prev_val = max(
                    candidates, key=lambda t: (t[0], -t[1])
                )
                mark = ""
            else:
                cur_val = min(rounds[latest].values())
                any_src = [r for r in rounds if r < latest]
                if any_src:
                    prev = max(any_src)
                    prev_val, mark = min(rounds[prev].values()), "~"
                else:
                    prev_val = None
            cur = f"{cur_val:.2f}"
            if prev_val is not None:
                ratio = cur_val / prev_val if prev_val else float("inf")
                prev_s = f"r{prev:02d}:{prev_val:.2f}"
                delta = f"{ratio:.2f}x{mark}"
            else:
                prev_s, delta = "-", "-"
            rows.append((name, tier, f"r{latest:02d}", cur, prev_s, delta))
        else:
            rows.append((name, tier, "-", "-", "-", "-"))
            missing += 1
    if md:
        print("| query | tier | latest bench | sec | prev | delta |")
        print("|---|---|---|---|---|---|")
        for r in rows:
            print("| " + " | ".join(r) + " |")
    else:
        print(
            f"{'query':35s} {'tier':>10s} {'bench':>6s} {'sec':>8s}"
            f" {'prev':>12s} {'delta':>7s}"
        )
        for r in rows:
            print(
                f"{r[0]:35s} {r[1]:>10s} {r[2]:>6s} {r[3]:>8s}"
                f" {r[4]:>12s} {r[5]:>7s}"
            )
    print(
        f"-- {len(rows)} entries, {missing} with no bench row anywhere",
        file=sys.stderr,
    )
    return 1 if missing else 0


if __name__ == "__main__":
    raise SystemExit(main())
