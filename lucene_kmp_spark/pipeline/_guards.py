"""Scale foot-gun guards for verification-only operator forms."""

from __future__ import annotations

from pyspark.sql import DataFrame

# above this row count a quadratic all-pairs join is presumed a mistake
ALL_PAIRS_ROW_LIMIT = 100_000


def guard_all_pairs(
    df: DataFrame, fn_name: str, scale_path: str, allow_all_pairs: bool
) -> None:
    """Refuse quadratic all-pairs execution on large inputs unless the
    caller explicitly opts in. The check costs one bounded count
    (``limit(N+1)``), negligible next to the join it prevents."""
    if allow_all_pairs:
        return
    n = df.limit(ALL_PAIRS_ROW_LIMIT + 1).count()
    if n > ALL_PAIRS_ROW_LIMIT:
        raise ValueError(
            f"{fn_name}: input has more than {ALL_PAIRS_ROW_LIMIT:,} rows and "
            "no candidate/bucket restriction — the all-pairs form is "
            f"quadratic and meant for verification scale only. Use "
            f"{scale_path} for the bucketed scale path, or pass "
            "allow_all_pairs=True to force it."
        )
