"""As-of (point-in-time) join — a temporal operator Spark's DataFrame
API lacks as a built-in, composed here from existing operators (the
SURVEY §7 guidance for custom operators: composition first, UDFs only
if semantics demand).

Semantics (direction="backward"): for each left row, attach the right
row with the LARGEST right_time ≤ left_time among rows sharing the key
— the classic "most recent quote for each trade" join.
direction="forward" takes the smallest right_time ≥ left_time.

Plan shape (scale-first): tag and union the two sides, hash-shuffle
ONCE on the key, sort within partitions by (time, side-order), and
carry the right side's payload forward with ``last(ignorenulls)`` /
``first(ignorenulls)`` over an unbounded-preceding window — then keep
only left rows.  No range explosion, no per-key loops, one shuffle:
the same cost as a single window function.  Skewed keys are handled by
AQE skew splitting on the shuffle; ties (equal timestamps) resolve
with the right row counted BEFORE the left row (standard as-of
convention: a quote at exactly trade time matches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    value_columns: list[str],
    direction: str = "backward",
    suffix: str = "_asof",
    tolerance: float | None = None,
) -> DataFrame:
    """Attach ``value_columns`` (+ the matched right time as
    ``{right_time}{suffix}``) from the as-of matching right row; left
    rows with no match keep nulls.

    ``tolerance`` (seconds): a match farther than this from the left
    time reverts to no-match (NULLs) — pandas merge_asof semantics;
    the stale-quote guard every as-of consumer eventually needs.
    Applied as a post-window projection, so the plan shape (one
    union + one window pass, no join) is unchanged."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join direction must be backward/forward, got {direction!r}")
    # `not (tolerance >= 0)` also rejects NaN — `NaN < 0` is False, and
    # a NaN bound would silently disable the check (NaN sorts greater
    # than every double, so `abs(dt) <= NaN` holds for all matches)
    if tolerance is not None and not tolerance >= 0:
        raise ValueError(f"asof_join tolerance must be >= 0, got {tolerance!r}")

    def time_to_double(df: DataFrame, col_name: str):
        # TIMESTAMP_NTZ has no direct double cast; route timestamps
        # through TIMESTAMP (epoch seconds).  DATE cannot cast to
        # double at all (AnalysisException) — route it through
        # TIMESTAMP too (midnight epoch, matching DuckDB's epoch(date)
        # in the oracles).  Numerics cast directly.
        dtype = dict(df.dtypes)[col_name]
        col = F.col(col_name)
        if dtype.startswith("timestamp") or dtype == "date":
            return col.cast("timestamp").cast("double")
        return col.cast("double")

    left_cols = left.columns

    tagged_left = left.select(
        F.col(left_on).alias("__k__"),
        time_to_double(left, left_time).alias("__t__"),
        # Right side sorts before left on ties for backward (a right row
        # at exactly t matches), after left for forward.
        F.lit(1 if direction == "backward" else 0).alias("__side__"),
        F.struct(*[F.col(c) for c in left_cols]).alias("__left__"),
        F.lit(None).cast("double").alias("__rt__"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__rv_{c}__") for c in value_columns],
    )
    tagged_right = right.select(
        F.col(right_on).alias("__k__"),
        time_to_double(right, right_time).alias("__t__"),
        F.lit(0 if direction == "backward" else 1).alias("__side__"),
        F.lit(None).cast(tagged_left.schema["__left__"].dataType).alias("__left__"),
        time_to_double(right, right_time).alias("__rt__"),
        *[F.col(c).alias(f"__rv_{c}__") for c in value_columns],
    )

    unioned = tagged_left.unionByName(tagged_right)

    if direction == "backward":
        w = (
            Window.partitionBy("__k__")
            .orderBy(F.col("__t__").asc(), F.col("__side__").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = [F.last(f"__rv_{c}__", ignorenulls=True).over(w).alias(f"__m_{c}__") for c in value_columns]
        matched_time = F.last("__rt__", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy("__k__")
            .orderBy(F.col("__t__").asc(), F.col("__side__").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = [F.first(f"__rv_{c}__", ignorenulls=True).over(w).alias(f"__m_{c}__") for c in value_columns]
        matched_time = F.first("__rt__", ignorenulls=True).over(w)

    rts = f"{right_time}{suffix}"
    joined = unioned.select(
        "__side__", "__left__", "__t__", matched_time.alias(rts), *carried
    ).filter(F.col("__left__").isNotNull())
    if tolerance is not None:
        within = F.abs(F.col("__t__") - F.col(rts)) <= F.lit(float(tolerance))
        joined = joined.select(
            "__side__", "__left__", "__t__",
            F.when(within, F.col(rts)).alias(rts),
            *[
                F.when(within, F.col(f"__m_{c}__")).alias(f"__m_{c}__")
                for c in value_columns
            ],
        )

    return joined.select(
        *[F.col("__left__")[c].alias(c) for c in left_cols],
        rts,
        *[F.col(f"__m_{c}__").alias(f"{c}{suffix}") for c in value_columns],
    )
