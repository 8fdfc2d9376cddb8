"""Deterministic HyperLogLog distinct-count sketch — exactly
oracle-checkable, unlike the engine-native HLLs.

``approx_distinct`` (plans/analytics.py) exposes Spark's built-in
``approx_count_distinct`` — a real HLL whose register layout is engine
private, so its driver row is rows-only by nature.  This module
implements HLL from first principles on engine-portable primitives so
the whole sketch — registers AND estimate — hash-matches a generated
DuckDB oracle bit for bit:

- key hash: the proven 60-bit md5-prefix fold
  (``conv(substring(md5(k),1,15),16,10)`` == DuckDB
  ``('0x'||substr(md5(k),1,15))::BIGINT``);
- bucket = low p bits (``% m``); the remaining ``60-p`` bits are the
  rho-domain ``w``; rho = leading zeros of the fixed-width ``w`` + 1,
  computed WITHOUT libm as ``(60-p) - length(ltrim(bin(w),'0')) + 1``
  (``bin`` renders identically in both engines, ``bin(0) -> '0'``
  whose ltrim is empty = bitlen 0);
- the register sum Σ 2^-reg runs in INTEGER space (Σ 2^(Q-reg) at
  Q = 61-p, one exact BIGINT per group — FP-addition order can never
  matter), empty registers contribute 2^Q each via (m - n_used);
- the raw estimate alpha·m²/Σ2^-reg is ONE fixed double operation
  tree — alpha is pre-quantized to A/2^20 (integer-division literal
  encoding; bare high-precision literals mis-round in DuckDB), 2^Q
  is exactly representable — so per-row double arithmetic is
  bit-identical across engines.

Small-range (linear counting) correction WITHOUT runtime libm: the
standard m·ln(m/V) estimate depends only on V = number of empty
buckets, which has just m possible values — so the whole correction
is a PRECOMPUTED lookup table, generated once in Python at plan-build
time, quantized to 2^-20 units, and embedded as the SAME constant
array in both the Spark plan and the SQL oracle.  Runtime arithmetic
stays integer/exact-double; both engines take the same branch and
read the same table cell, so bit-parity holds.  (The large-range
2^32-domain correction is unnecessary: the hash domain here is 60-bit
and collisions are negligible below ~2^30 distinct keys per group.)
Accuracy: linear counting below the 2.5·m crossover, the classic
~1.04/sqrt(m) relative error above it; tests pin both regimes.

Scale notes (100 TB): the classic win over COUNT(DISTINCT) — the
first aggregation reduces to at most |groups|·m register rows with
map-side partial MAX (the full key set never shuffles), the second to
one row per group.  Register state is bounded by m regardless of
cardinality; nothing driver-side at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HASH_BITS = 60  # 15 md5 hex digits — the engine-exact fold


def _alpha_q20(m: int) -> int:
    """HLL bias constant alpha_m, quantized to 2^-20 units so both
    engines reconstruct the IDENTICAL double via A/1048576.0."""
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    return round(alpha * (1 << 20))


def _lc_table_q20(m: int) -> list[int]:
    """Linear-counting estimates m·ln(m/V) for V = 1..m, quantized to
    2^-20 units.  Python's libm runs ONCE here at plan-build time; both
    engines consume the identical integer constants, so cross-engine
    bit-parity cannot depend on runtime libm."""
    import math

    return [round(m * math.log(m / v) * (1 << 20)) for v in range(1, m + 1)]


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    *,
    p: int = 8,
) -> DataFrame:
    """Per-group HLL distinct estimate of ``key_col``.

    Output: ``group_cols``, ``n_buckets_used`` (BIGINT ≤ m=2^p),
    ``hll_est`` (DOUBLE, raw HLL estimate).  NULL keys are skipped
    (COUNT DISTINCT semantics); NULL groups form their own group (both
    engines agree under GROUP BY)."""
    if not 4 <= p <= 16:
        raise ValueError(f"hll p must be in [4, 16], got {p}")
    if not group_cols:
        # the oracle generator cannot render the global (no-group) case;
        # refuse on both sides so the pair cannot drift — group by a
        # constant column for a global estimate
        raise ValueError("hll_distinct requires at least one group column")
    internal = {"__h__", "__b__", "__w__", "__r__", "__s1__"}
    outputs = {"n_buckets_used", "hll_est"}
    collisions = (internal | outputs) & (set(df.columns) | set(group_cols))
    if collisions:
        raise ValueError(
            f"hll_distinct: input/group column(s) {sorted(collisions)} "
            "collide with internal or output names — rename them first"
        )
    return hll_finalize(
        hll_registers(df, key_col, group_cols, p=p), group_cols, p=p
    )


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    *,
    p: int = 8,
) -> DataFrame:
    """The MERGEABLE half of the sketch: (group_cols, __b__, __r__)
    register rows — max rho per (group, bucket).  Works on a STREAM
    too (one stateful MAX aggregate, outputMode complete/update):
    registers merge across batches, engines, and time by plain MAX, so
    a landing-zone stream can maintain them incrementally and
    ``hll_finalize`` turns any snapshot into the estimate.
    tests/test_multimodal_streaming.py pins stream==batch parity."""
    m = 1 << p
    base = df.where(F.col(key_col).isNotNull()).select(
        *group_cols,
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("__h__"),
    )
    split = base.select(
        *group_cols,
        (F.col("__h__") % m).alias("__b__"),
        F.expr(f"__h__ DIV {m}").alias("__w__"),
    )
    rho = (
        F.lit(_HASH_BITS - p)
        - F.length(F.expr("trim(LEADING '0' FROM bin(__w__))"))
        + F.lit(1)
    )
    return split.groupBy(*group_cols, "__b__").agg(F.max(rho).alias("__r__"))


def hll_finalize(
    regs: DataFrame,
    group_cols: list[str],
    *,
    p: int = 8,
) -> DataFrame:
    """Estimate from a register table (the serving-time half)."""
    m = 1 << p
    q = _HASH_BITS - p + 1  # max rho (w == 0)
    a20 = _alpha_q20(m)
    per_group = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_buckets_used"),
        F.sum(F.expr(f"shiftleft(1L, CAST({q} - __r__ AS INT))")).alias("__s1__"),
    )
    # Σ 2^-reg scaled by 2^q: used buckets from __s1__, the (m - used)
    # empty buckets at reg=0 contribute 2^q each.  All integer-exact.
    s_total = F.col("__s1__") + (F.lit(m) - F.col("n_buckets_used")) * F.lit(
        1 << q
    )
    raw = (
        (F.lit(a20).cast("double") / F.lit(float(1 << 20)))
        * F.lit(float(m * m))
        * F.lit(float(1 << q))
        / s_total.cast("double")
    )
    from .bloom import long_array_lit

    lc_arr = long_array_lit(_lc_table_q20(m))
    v = F.lit(m) - F.col("n_buckets_used")  # empty buckets
    lc_est = F.element_at(lc_arr, v.cast("int")).cast("double") / F.lit(
        float(1 << 20)
    )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > F.lit(0)), lc_est
    ).otherwise(raw)
    return per_group.select(
        *group_cols, "n_buckets_used", est.alias("hll_est")
    )


def build_hll_store(
    df: DataFrame,
    path: str,
    key_col: str,
    group_cols: list[str],
    *,
    p: int = 8,
    mode: str = "overwrite",
) -> None:
    """Persist the mergeable register half (:func:`hll_registers`) as a
    parquet REGISTER STORE — the distinct-count sibling of
    incremental.build_neardup_store.  Built once from the corpus, then
    APPENDED per ingested batch (``mode='append'``): registers merge by
    plain MAX per (group, bucket), so appending a batch's register rows
    and re-MAXing at read time (:func:`hll_from_store`) is EXACTLY the
    single-pass sketch over the union — the md5 bucketing is
    deterministic and MAX is associative/commutative/idempotent, so
    batch boundaries, append order, and even re-appending the same
    batch cannot change the estimate.  At 100 TB this replaces
    re-scanning the corpus per distinct-count refresh: each batch costs
    its own ≤|groups|·m register rows, and the store never exceeds
    |groups|·m rows per append generation (compact by rewriting the
    re-MAXed table with ``mode='overwrite'`` when generations pile up)."""
    hll_registers(df, key_col, group_cols, p=p).write.mode(mode).parquet(path)


def hll_merge_registers(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Re-MAX a register table that may hold several generations of
    appended rows per (group, bucket) — idempotent on an already-merged
    table, so it is always safe to apply after a store read."""
    return regs.groupBy(*group_cols, "__b__").agg(
        F.max("__r__").alias("__r__")
    )


def hll_from_store(
    spark,
    store_path: str,
    group_cols: list[str],
    *,
    p: int = 8,
    schema: str | None = None,
    batch: DataFrame | None = None,
    key_col: str | None = None,
) -> DataFrame:
    """Estimate from a persisted register store, optionally merging a
    NEW batch's registers in the same pass (serve-before-append): the
    store generations and the batch registers union, re-MAX per
    (group, bucket), and finalize.  ``schema`` (DDL string covering the
    group columns plus ``__b__ long, __r__ int``) makes a cold-start
    read of an EMPTY store work — zero part files have no footers to
    infer from, same contract as incremental.neardup_gate_from_store."""
    reader = spark.read.schema(schema) if schema else spark.read
    regs = reader.parquet(store_path).select(*group_cols, "__b__", "__r__")
    if batch is not None:
        if key_col is None:
            raise ValueError("hll_from_store: batch requires key_col")
        regs = regs.unionByName(hll_registers(batch, key_col, group_cols, p=p))
    return hll_finalize(hll_merge_registers(regs, group_cols), group_cols, p=p)


def hll_oracle_sql(
    *, table: str, key_col: str, group_cols: list[str], p: int = 8
) -> str:
    """DuckDB SQL mirror of hll_distinct, generated from the same
    constants (m, Q, quantized alpha) so the two cannot drift."""
    if not group_cols:
        raise ValueError("hll_oracle_sql requires at least one group column")
    m = 1 << p
    q = _HASH_BITS - p + 1
    a20 = _alpha_q20(m)
    lc_list = "[" + ",".join(str(t) for t in _lc_table_q20(m)) + "]"
    g = ", ".join(group_cols)
    raw = (
        f"(CAST({a20} AS DOUBLE) / 1048576.0) * CAST({m * m} AS DOUBLE)"
        f" * CAST({1 << q} AS DOUBLE)"
        f" / CAST(s1 + ({m} - n_buckets_used) * (1::BIGINT << {q}) AS DOUBLE)"
    )
    return f"""
WITH __hll_base AS (
  SELECT {g},
         ('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM {table} WHERE {key_col} IS NOT NULL
), __hll_regs AS (
  SELECT {g}, h % {m} AS b,
         MAX({_HASH_BITS - p} - length(ltrim(bin(h // {m}), '0')) + 1) AS r
  FROM __hll_base GROUP BY ALL
), __hll_groups AS (
  SELECT {g}, CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
         CAST(SUM(1::BIGINT << ({q} - r)) AS BIGINT) AS s1
  FROM __hll_regs GROUP BY ALL
)
SELECT {g}, n_buckets_used,
       CASE WHEN ({raw}) <= {2.5 * m} AND ({m} - n_buckets_used) > 0
            THEN CAST(list_extract({lc_list}, CAST({m} - n_buckets_used AS INT)) AS DOUBLE) / 1048576.0
            ELSE ({raw}) END AS hll_est
FROM __hll_groups
"""
