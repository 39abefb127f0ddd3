"""Skew-mitigation utilities.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but only for sort-merge/shuffle-hash joins it can observe.
`salted_join` is the explicit fallback for pathological key skew (one
key carrying a double-digit percent of a 100 TB fact table): the
small side is replicated once per salt, the large side picks a
uniform salt per row, and the join key becomes (key, salt) — the hot
key's rows spread across `n_salts` tasks instead of one straggler.

Cost model: small side grows n_salts-fold (it must still broadcast or
shuffle cheaply); large side is unchanged.  Use only when AQE's
splitting is insufficient (extreme single-key skew) — measured here
with a 50%-hot-key fixture in tests/test_skew.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `large ⋈ small` on column `on`, salted against skew.

    Result is identical to `large.join(small, on, how)` for inner and
    left joins (the salt is an internal key extension, every small-side
    row exists for every salt)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt_values = F.sequence(F.lit(0), F.lit(n_salts - 1))
    small_rep = small.withColumn("_salt", F.explode(salt_values))
    # Any per-row salt works for correctness; a seeded uniform draw
    # spreads hot keys evenly.
    large_salted = large.withColumn(
        "_salt", F.floor(F.rand(seed=42) * n_salts).cast("int")
    )
    out = large_salted.join(small_rep, [on, "_salt"], how)
    return out.drop("_salt")
