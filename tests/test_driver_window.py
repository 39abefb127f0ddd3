"""The DRIVER_WINDOW rotation policy, enforced mechanically (r8
self-review finding: a hand-transcribed window silently skipped
`bucketed_join_colocated` past its oldest-first turn).

Policy (registry.py comment, binding form): each round the window is
the 50 registry entries with the OLDEST driver-round evidence, where
entries with no driver row yet (new this round) count as oldest of
all; ties break alphabetically.  Evidence source = the committed
CORRECTNESS_r*.json driver artifacts, same parser the coverage ledger
uses."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from coverage_ledger import load_evidence  # noqa: E402

from etl_addresses_spark.registry import _ALL, DRIVER_WINDOW  # noqa: E402


def test_window_is_the_50_oldest_driver_entries():
    driver, _full = load_evidence()
    expected = sorted(
        _ALL, key=lambda n: (driver.get(n, -1), n)
    )[: len(DRIVER_WINDOW)]
    if set(DRIVER_WINDOW) == set(expected):
        return
    # The OTHER valid state: the driver has already scored this very
    # window, which flips its entries from oldest to newest without
    # any code change — the window is then correct-but-spent, and the
    # NEXT round's builder must rotate (ledger + verdict enforce
    # that).  Majority rather than "any" (r8 advice: a single
    # max-round member must not excuse a mis-rotated window forever),
    # but not "all": a red row in the scored window keeps its OLD
    # round and must not turn a correctly-built window into a test
    # failure.  A typo'd rotation still fails: a freshly rotated
    # window contains only old-round entries, so far fewer than half
    # its members carry the max round.
    max_round = max(driver.values(), default=0)
    at_max = sum(1 for n in DRIVER_WINDOW if driver.get(n) == max_round)
    assert at_max > len(DRIVER_WINDOW) // 2, (
        "window is neither the 50 oldest nor freshly driven",
        sorted(set(expected) - set(DRIVER_WINDOW)),
        sorted(set(DRIVER_WINDOW) - set(expected)),
    )


def test_window_size_and_membership():
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    missing = [n for n in DRIVER_WINDOW if n not in _ALL]
    assert not missing, missing
