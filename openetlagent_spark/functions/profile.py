"""Column profiling — the ANALYZE-style statistics pass every pipeline
runs before trusting a new 100 TB input: per-column row/null/distinct
counts and min/max, as one long-format stats table.

The reference engine validates declared schemas but computes no data
statistics (SURVEY §2.1 engine-level table — validation is dtype-only);
this fills that gap the Spark-first way: ONE scan, one aggregate row
(Spark plans multiple DISTINCT aggregates as a single Expand pass), and
a per-column struct explode into the long format.  No per-column
re-scan — profiling C columns costs one pass regardless of C.

``approx=True`` swaps exact COUNT(DISTINCT) for HLL++
``approx_count_distinct`` — the mergeable-sketch path that keeps the
Expand pass single-aggregation at petabyte scale.  The exact mode is
what the driver oracle checks; the approx mode is floor-tested.

min/max are cast to string for a uniform schema; the harness query
profiles integer/string columns only, where Spark's and DuckDB's
casts agree byte-for-byte (float formatting differs between engines
and is deliberately excluded from the oracle-checked surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, columns: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """Profile ``columns`` (default: all) into a long-format table:
    (col, n_rows, n_nulls, n_distinct, min_value, max_value)."""
    cols = columns or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile: unknown columns {missing}; available {df.columns}")
    nd = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.col(c)).alias(f"__c{i}__"),
            nd(F.col(c)).alias(f"__d{i}__"),
            F.min(F.col(c)).cast("string").alias(f"__lo{i}__"),
            F.max(F.col(c)).cast("string").alias(f"__hi{i}__"),
        ]
    one = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col("__n__").alias("n_rows"),
                (F.col("__n__") - F.col(f"__c{i}__")).alias("n_nulls"),
                F.col(f"__d{i}__").alias("n_distinct"),
                F.col(f"__lo{i}__").alias("min_value"),
                F.col(f"__hi{i}__").alias("max_value"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return one.select(F.explode(structs).alias("p")).select("p.*")


def profile_oracle_sql(table: str, columns: list[str]) -> str:
    """DuckDB mirror of profile_columns (exact mode): one UNION ALL arm
    per column — the oracle may scan C times; the Spark plan must not."""
    arms = [
        (
            f"SELECT '{c}' AS col, COUNT(*) AS n_rows, "
            f"COUNT(*) - COUNT({c}) AS n_nulls, "
            f"COUNT(DISTINCT {c}) AS n_distinct, "
            f"CAST(MIN({c}) AS VARCHAR) AS min_value, "
            f"CAST(MAX({c}) AS VARCHAR) AS max_value FROM {table}"
        )
        for c in columns
    ]
    return " UNION ALL ".join(arms)


def value_histogram(
    df: DataFrame,
    col: str,
    bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Fixed-width histogram of a numeric column — the distribution
    companion to :func:`profile_columns` (drift monitoring, outlier
    screens, binning for reports).  Returns one row per NON-EMPTY bin:
    (bin, lo_edge, hi_edge, n), NULLs excluded.

    ``lo``/``hi`` default to the column min/max (one extra tiny
    aggregate); values at ``hi`` land in the last bin (the standard
    right-closed final bucket).  Bin arithmetic is a fixed IEEE
    expression — ``floor((x - lo) / width)`` clamped to [0, bins-1] —
    so the oracle reproduces it bit-for-bit.  One map-side-combined
    shuffle on the bin id; at 100 TB this is a scan plus a ``bins``-row
    aggregate."""
    if bins <= 0:
        raise ValueError(f"value_histogram bins must be positive, got {bins}")
    if col not in df.columns:
        raise ValueError(f"value_histogram: unknown column {col!r}; available {df.columns}")
    x = F.col(col).cast("double")
    # NaN is excluded like NULL (floor(NaN) is 0 in Spark — it would
    # silently inflate bin 0 — and NaN poisons derived max()); the
    # column must be numeric-castable, matching the oracle's CAST.
    base = df.filter(F.col(col).isNotNull() & ~F.isnan(x))
    if lo is None or hi is None:
        row = base.agg(F.min(x), F.max(x)).first()
        if row is None or row[0] is None:
            raise ValueError(
                f"value_histogram: cannot derive bounds — column {col!r} has no "
                "non-NULL, non-NaN values; pass lo/hi explicitly"
            )
        lo = float(row[0]) if lo is None else lo
        hi = float(row[1]) if hi is None else hi
    if not hi > lo:
        raise ValueError(f"value_histogram needs hi > lo, got [{lo}, {hi}]")
    width = (hi - lo) / bins
    # clamp BEFORE the int cast: an out-of-range value (inf, or
    # anything with (x-lo)/width >= 2^31) would overflow the cast —
    # a job-killing CAST_OVERFLOW under ANSI, a wrapped wrong bin
    # without it.  Clamping in LONG makes both impossible.
    bin_id = F.least(
        F.lit(bins - 1).cast("long"),
        F.greatest(F.lit(0).cast("long"), F.floor((x - F.lit(lo)) / F.lit(width))),
    ).cast("int")
    return (
        base.select(bin_id.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.lit(lo) + F.col("bin").cast("double") * F.lit(width)).alias("lo_edge"),
            (F.lit(lo) + (F.col("bin") + F.lit(1)).cast("double") * F.lit(width)).alias(
                "hi_edge"
            ),
            "n",
        )
    )


def histogram_oracle_sql(
    table: str, col: str, bins: int, lo: float, hi: float
) -> str:
    """DuckDB mirror of value_histogram: identical clamp/floor/edge
    arithmetic with ``repr``-emitted bounds, so bins and edges are
    bit-exact."""
    width = (hi - lo) / bins
    x = f"CAST({col} AS DOUBLE)"
    # same clamp-before-cast and NaN exclusion as the Spark plan;
    # DuckDB's floor stays DOUBLE (it would error casting inf to a
    # bigint), so the clamp happens in DOUBLE and only the bounded
    # result is cast — Spark's floor returns a saturating LONG, so its
    # clamp happens post-floor; both land on the identical bin
    bin_id = (
        f"CAST(least(CAST({bins - 1} AS DOUBLE), greatest(CAST(0 AS DOUBLE), "
        f"floor(({x} - {lo!r}) / {width!r}))) AS INTEGER)"
    )
    return (
        f"SELECT bin, {lo!r} + CAST(bin AS DOUBLE) * {width!r} AS lo_edge, "
        f"{lo!r} + CAST(bin + 1 AS DOUBLE) * {width!r} AS hi_edge, n FROM ("
        f"SELECT {bin_id} AS bin, COUNT(*) AS n FROM {table} "
        f"WHERE {col} IS NOT NULL AND NOT isnan({x}) GROUP BY 1)"
    )


def outlier_flags(
    df: DataFrame,
    col: str,
    z_threshold: float = 3.0,
    group_cols: list[str] | None = None,
    scale_digits: int = 6,
) -> DataFrame:
    """Z-score outlier flagging — the numeric data-quality screen
    (corrupt sensor values, price glitches, length explosions) as an
    exactly-reproducible operator: adds ``zscore`` and ``is_outlier``
    (|z| > threshold) to EVERY row — NULL/NaN inputs keep their row with
    ``zscore`` NULL and ``is_outlier`` false (a dropped row is itself a
    signal a quality screen must not eat) — optionally per
    ``group_cols`` stratum (NULL group keys form their own stratum via
    null-safe join keys, matching SQL GROUP BY).

    Exactness at scale (the kmeans quantize-for-exactness move): values
    snap once to a ``10^-scale_digits`` grid, so the power sums Σx and
    Σx² accumulate as EXACT decimals — partition-order- and
    engine-independent where double accumulation drifts in the last
    ulp.  The derived moments are correctly-rounded divisions, sqrt is
    correctly-rounded IEEE, and the grid scale cancels in z (both the
    deviation and the stddev are in grid units), so every z-score is
    bit-identical across engines.  A value too large for the grid
    (|x| ≥ 2^63 / 10^scale_digits) raises loudly on both engines
    instead of silently saturating.  Population variance (N divisor);
    zero-variance strata flag nothing (z defined as 0).  One tiny
    aggregate (global: 1 row; grouped: |strata| rows) broadcast back
    onto the scan."""
    if col not in df.columns:
        raise ValueError(f"outlier_flags: unknown column {col!r}; available {df.columns}")
    groups = group_cols or []
    x = F.col(col).cast("double")
    valid = F.col(col).isNotNull() & ~F.isnan(x)
    grid = float(10 ** scale_digits)
    limit = 9.2e18 / grid  # < Long.MAX / grid: quantization must not saturate
    xq_raw = F.round(x * F.lit(grid)).cast("long")
    xq = F.when(
        F.abs(x) < F.lit(limit), xq_raw
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"outlier_flags: |{col}| too large for the 10^{scale_digits} "
                    "grid (would overflow the exact accumulator): "
                ),
                x.cast("string"),
            )
        ).cast("long")
    )
    xd = xq.cast("decimal(19,0)")  # (19,0)^2 -> (38,0): exact integer square
    annotated = df.withColumn("__xq__", F.when(valid, xq)).withColumn(
        "__sq__", F.when(valid, xd * xd)
    )
    stats = (
        annotated.filter(valid)
        .groupBy(*groups)
        .agg(
            F.count(F.lit(1)).alias("__n__"),
            # decimal accumulation for BOTH power sums — a long Σx wraps
            # silently around sf40 on price-scale data
            F.sum(F.col("__xq__").cast("decimal(19,0)")).alias("__s1__"),
            F.sum("__sq__").alias("__s2__"),
        )
    )
    n = F.col("__n__").cast("double")
    mean = F.col("__s1__").cast("double") / n
    # E[x^2] - E[x]^2 in grid units; clamp rounding residue to 0
    var = F.greatest(
        F.col("__s2__").cast("double") / n - mean * mean, F.lit(0.0)
    )
    std = F.sqrt(var)
    if groups:
        cond = None
        for g in groups:
            c = annotated[g].eqNullSafe(stats[g])  # NULL keys are a stratum
            cond = c if cond is None else cond & c
        joined = annotated.join(F.broadcast(stats), cond, "left")
        for g in groups:
            joined = joined.drop(stats[g])
    else:
        joined = annotated.crossJoin(F.broadcast(stats))
    z = F.when(valid & (std > 0), (F.col("__xq__").cast("double") - mean) / std).when(
        valid, F.lit(0.0)
    )
    return joined.select(
        *df.columns,
        z.alias("zscore"),
        F.coalesce(F.abs(z) > F.lit(z_threshold), F.lit(False)).alias("is_outlier"),
    )


def outlier_oracle_sql(
    table: str,
    col: str,
    out_cols: str,
    z_threshold: float = 3.0,
    group_cols: list[str] | None = None,
    scale_digits: int = 6,
) -> str:
    """DuckDB mirror of outlier_flags: identical grid quantization,
    decimal power sums, division order, sqrt, NULL-row and NULL-stratum
    rules.  ``out_cols`` is the comma-joined source column list to
    carry through (qualified with b. below)."""
    groups = group_cols or []
    gsel = (", ".join(groups) + ", ") if groups else ""
    gby = ("GROUP BY " + ", ".join(groups)) if groups else ""
    join = (
        ("LEFT JOIN s ON " + " AND ".join(
            f"b.{g} IS NOT DISTINCT FROM s.{g}" for g in groups
        ))
        if groups
        else "CROSS JOIN s"
    )
    out_cols = ", ".join("b." + c.strip() for c in out_cols.split(","))
    grid = float(10 ** scale_digits)
    x = f"CAST(b.{col} AS DOUBLE)"
    xs = f"CAST({col} AS DOUBLE)"
    valid = f"(b.{col} IS NOT NULL AND NOT isnan({x}))"
    xq = f"CAST(round({x} * {grid!r}) AS BIGINT)"
    xqs = f"CAST(round({xs} * {grid!r}) AS BIGINT)"
    xds = f"CAST({xqs} AS DECIMAL(19,0))"
    mean = "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
    var = f"greatest(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - {mean} * {mean}, 0.0)"
    z = (
        f"CASE WHEN {valid} AND sqrt({var}) > 0 "
        f"THEN (CAST({xq} AS DOUBLE) - {mean}) / sqrt({var}) "
        f"WHEN {valid} THEN 0.0 END"
    )
    return (
        f"WITH s AS (SELECT {gsel}COUNT(*) AS n, SUM({xds}) AS s1, "
        f"SUM({xds} * {xds}) AS s2 FROM {table} "
        f"WHERE {col} IS NOT NULL AND NOT isnan({xs}) {gby}) "
        f"SELECT {out_cols}, {z} AS zscore, "
        f"COALESCE(abs({z}) > {z_threshold!r}, FALSE) AS is_outlier "
        f"FROM {table} b {join}"
    )


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Join/aggregation-key SKEW diagnostic — the report to run BEFORE
    shuffling 100 TB on a key: per-key counts reduce to distribution
    stats (distinct keys, total rows, max/mean/median/p99 key count,
    the max/median skew ratio) and the ``top_k`` heaviest keys.  A
    skew_ratio in the tens means AQE skew-split or salting
    (operators/bind.py bind_salted) before the real job.

    Output: one row per heavy key — (key, cnt, share) plus the global
    stats repeated on every row (1-row broadcast; keeps the result a
    single flat frame the flow surface can sink).  NULL keys count as
    a key (they hash-partition together — exactly the skew hazard).

    Scale shape: ONE count shuffle on the key; the stats reduce the
    key-count table to 1 row; the heavy-key pick is a TakeOrdered
    (distributed partial top-k, never a global sort); both broadcast.
    Exactness: counts are integers; mean/share are single divisions;
    the quantiles are the same interpolated doubles the `percentile`
    query already hash-matches."""
    if top_k <= 0:
        raise ValueError(f"key_skew_report top_k must be positive, got {top_k!r}")
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        F.percentile(F.col("cnt"), F.lit(0.5)).alias("p50_cnt"),
        F.percentile(F.col("cnt"), F.lit(0.99)).alias("p99_cnt"),
    ).withColumn(
        "mean_cnt", F.col("n_rows").cast("double") / F.col("n_keys").cast("double")
    ).withColumn(
        "skew_ratio", F.col("max_cnt").cast("double") / F.col("p50_cnt")
    )
    top = counts.orderBy(F.desc("cnt"), F.asc_nulls_first("key")).limit(top_k)
    return top.join(F.broadcast(stats)).select(
        F.col("key").cast("string").alias("key"),
        "cnt",
        (F.col("cnt").cast("double") / F.col("n_rows").cast("double")).alias("share"),
        "n_keys",
        "n_rows",
        "max_cnt",
        "mean_cnt",
        "p50_cnt",
        "p99_cnt",
        "skew_ratio",
    )


def key_skew_oracle_sql(table: str, key_col: str, top_k: int = 10) -> str:
    """DuckDB mirror of :func:`key_skew_report` — same tie-break, same
    quantile definition, same single-division doubles."""
    return f"""
WITH c AS (SELECT {key_col} AS key, CAST(count(*) AS BIGINT) AS cnt
           FROM {table} GROUP BY {key_col}),
s AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(max(cnt) AS BIGINT) AS max_cnt,
             quantile_cont(cnt, 0.5) AS p50_cnt,
             quantile_cont(cnt, 0.99) AS p99_cnt
      FROM c),
top AS (SELECT key, cnt FROM c
        ORDER BY cnt DESC, key NULLS FIRST LIMIT {top_k})
SELECT CAST(top.key AS VARCHAR) AS key, top.cnt,
       CAST(top.cnt AS DOUBLE) / CAST(s.n_rows AS DOUBLE) AS share,
       s.n_keys, s.n_rows, s.max_cnt,
       CAST(s.n_rows AS DOUBLE) / CAST(s.n_keys AS DOUBLE) AS mean_cnt,
       s.p50_cnt, s.p99_cnt,
       CAST(s.max_cnt AS DOUBLE) / s.p50_cnt AS skew_ratio
FROM top, s
"""


def dataset_drift(
    df: DataFrame,
    side_col: str,
    value_col: str,
    side_a: str,
    side_b: str,
    *,
    bin_width: float = 256.0,
    n_bins: int = 20,
) -> DataFrame:
    """Distribution-shift audit between two slices of one corpus — the
    training-data drift check run before every refresh ("did the new
    crawl's length/quality profile move?").  Values histogram into
    ``n_bins`` fixed-width bins (last bin open-ended), counted per
    side, and each bin carries a chi-square-style drift term computed
    from INTEGER counts:

        term = (n_a·N_b − n_b·N_a)² / (N_a·N_b·(n_a+n_b))

    — the per-bin contribution of the two-sample chi-square statistic
    (equivalently a PSI-like divergence without the logarithm, so it
    stays engine-exact: integer cross products, ONE squaring and ONE
    division in doubles per bin).  Rows with NULL value or a side
    other than a/b are excluded.

    Output: (bin, n_a, n_b, drift_term) per occupied bin.  Scale: one
    shuffle on (side, bin) partial counts, then a broadcast of the two
    side totals — the corpus reduces to ≤ 2·n_bins counter rows before
    anything joins.  The TOTAL statistic is the sum of ~n_bins doubles
    — sum the returned column driver-side (bounded rows) if one number
    is wanted; a distributed SUM over doubles would reintroduce
    fold-order variance for no benefit at this cardinality."""
    if n_bins < 2 or bin_width <= 0:
        raise ValueError("dataset_drift needs n_bins >= 2 and bin_width > 0")
    v = F.col(value_col).cast("double")
    bin_ = F.least(
        F.floor(v / F.lit(float(bin_width))).cast("long"),
        F.lit(n_bins - 1).cast("long"),
    )
    base = (
        df.filter(
            F.col(side_col).isin([side_a, side_b]) & F.col(value_col).isNotNull()
        )
        .select(F.col(side_col).alias("__side__"), bin_.alias("bin"))
    )
    counts = (
        base.groupBy("bin")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("__side__") == side_a, 1).otherwise(0)),
                F.lit(0),
            ).cast("long").alias("n_a"),
            F.coalesce(
                F.sum(F.when(F.col("__side__") == side_b, 1).otherwise(0)),
                F.lit(0),
            ).cast("long").alias("n_b"),
        )
    )
    totals = counts.agg(
        F.sum("n_a").cast("long").alias("__na__"),
        F.sum("n_b").cast("long").alias("__nb__"),
    )
    joined = counts.crossJoin(F.broadcast(totals))
    diff = (
        F.col("n_a") * F.col("__nb__") - F.col("n_b") * F.col("__na__")
    ).cast("double")
    denom = (
        F.col("__na__").cast("double")
        * F.col("__nb__").cast("double")
        * (F.col("n_a") + F.col("n_b")).cast("double")
    )
    return joined.select(
        "bin",
        "n_a",
        "n_b",
        F.try_divide(diff * diff, denom).alias("drift_term"),
    )


def dataset_drift_oracle_sql(
    table: str,
    side_col: str,
    value_col: str,
    side_a: str,
    side_b: str,
    *,
    bin_width: float = 256.0,
    n_bins: int = 20,
) -> str:
    """DuckDB mirror of :func:`dataset_drift` — same integer counts,
    same single squaring/division order."""
    sa = side_a.replace("'", "''")
    sb = side_b.replace("'", "''")
    return f"""
WITH __dd_c AS MATERIALIZED (
  SELECT LEAST(CAST(FLOOR(CAST({value_col} AS DOUBLE) / {float(bin_width)!r}) AS BIGINT),
               {n_bins - 1}) AS bin,
         CAST(COALESCE(SUM(CASE WHEN {side_col} = '{sa}' THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_a,
         CAST(COALESCE(SUM(CASE WHEN {side_col} = '{sb}' THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_b
  FROM {table}
  WHERE {side_col} IN ('{sa}', '{sb}') AND {value_col} IS NOT NULL
  GROUP BY 1
), __dd_t AS (
  SELECT CAST(SUM(n_a) AS BIGINT) AS na, CAST(SUM(n_b) AS BIGINT) AS nb FROM __dd_c
)
SELECT c.bin, c.n_a, c.n_b,
       (CAST(c.n_a * t.nb - c.n_b * t.na AS DOUBLE) * CAST(c.n_a * t.nb - c.n_b * t.na AS DOUBLE))
       / NULLIF(CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE) * CAST(c.n_a + c.n_b AS DOUBLE), 0.0)
       AS drift_term
FROM __dd_c c CROSS JOIN __dd_t t
"""


def range_layout_audit(
    df: DataFrame,
    ts_col: str = "ts",
    n_ranges: int = 8,
    probe_lo: str = "",
    probe_hi: str = "",
) -> DataFrame:
    """Data-skipping audit for a planned range-clustered layout: split
    the observed time span into ``n_ranges`` equal-width slices (the
    file ranges a ``write_sorted``-style rewrite would own), report
    each slice's row count and observed min/max, and flag which slices
    a ``[probe_lo, probe_hi)`` window scan would PRUNE via footer
    min/max alone — the quantified before/after case for paying the
    clustering rewrite.

    Exactness: timestamps become BIGINT epoch micros; the slice width
    is the INTEGER ``((max − min) DIV n_ranges) + 1`` (the +1 makes
    the last point land inside slice n_ranges−1 and kills the
    width=0 single-instant edge case), assignment is one integer DIV,
    and the prune flag is two BIGINT comparisons against the probe's
    epoch bounds — no FP anywhere.

    Scale shape (100 TB): one 1-row min/max aggregate broadcasts, the
    slice id is a map-side projection, and the per-slice stats are ONE
    map-side-combined count shuffle bounded by ``n_ranges`` rows —
    this is a metadata-scale audit, never a sort (the REWRITE sorts;
    the plan does not).  NULL timestamps are excluded up front.

    Returns (range_id, n_rows, min_epoch, max_epoch, pruned) ordered
    by range_id.
    """
    if n_ranges < 1:
        raise ValueError(f"range_layout_audit n_ranges must be >= 1, got {n_ranges}")
    if not probe_lo or not probe_hi:
        raise ValueError("range_layout_audit needs probe_lo and probe_hi (ISO timestamps)")
    e = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = df.filter(F.col(ts_col).isNotNull()).select(e.alias("ep"))
    bounds = base.agg(
        F.min("ep").alias("lo"), F.max("ep").alias("hi")
    )
    lo_e = F.unix_micros(F.lit(probe_lo).cast("timestamp"))
    hi_e = F.unix_micros(F.lit(probe_hi).cast("timestamp"))
    with_w = base.crossJoin(F.broadcast(bounds)).select(
        "ep",
        F.expr("(hi - lo) DIV " + str(int(n_ranges)) + " + 1").alias("w"),
        F.col("lo"),
    )
    sliced = with_w.select(
        "ep", F.expr("(ep - lo) DIV w").cast("long").alias("range_id")
    )
    return (
        sliced.groupBy("range_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("ep").alias("min_epoch"),
            F.max("ep").alias("max_epoch"),
        )
        .select(
            "range_id", "n_rows", "min_epoch", "max_epoch",
            ((F.col("max_epoch") < lo_e) | (F.col("min_epoch") >= hi_e)).alias("pruned"),
        )
        .orderBy(F.asc("range_id"))
    )


def range_layout_audit_oracle_sql(
    table: str,
    ts_col: str = "ts",
    n_ranges: int = 8,
    probe_lo: str = "",
    probe_hi: str = "",
) -> str:
    """DuckDB mirror of :func:`range_layout_audit` — same integer
    width, same DIV assignment, same BIGINT prune comparisons."""
    if n_ranges < 1:
        raise ValueError(f"range_layout_audit n_ranges must be >= 1, got {n_ranges}")
    if not probe_lo or not probe_hi:
        raise ValueError("range_layout_audit needs probe_lo and probe_hi")
    return f"""
WITH __rl_b AS (
  SELECT epoch_us({ts_col}) AS ep FROM {table} WHERE {ts_col} IS NOT NULL
), __rl_m AS (
  SELECT MIN(ep) AS lo, MAX(ep) AS hi,
         (MAX(ep) - MIN(ep)) // {n_ranges} + 1 AS w
  FROM __rl_b
), __rl_s AS (
  SELECT (b.ep - m.lo) // m.w AS range_id, b.ep
  FROM __rl_b b CROSS JOIN __rl_m m
)
SELECT range_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(ep) AS min_epoch, MAX(ep) AS max_epoch,
       (MAX(ep) < epoch_us(TIMESTAMP '{probe_lo}')
        OR MIN(ep) >= epoch_us(TIMESTAMP '{probe_hi}')) AS pruned
FROM __rl_s
GROUP BY range_id
ORDER BY range_id ASC
"""


# --- snapshot diff ------------------------------------------------------------


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff between two table versions — the audit primitive
    behind every incremental-refresh validation ("what did this batch
    actually change?"): each key labeled ``added`` (only in new),
    ``removed`` (only in old), ``changed`` (present in both, any
    compare column differs), or ``unchanged``.  Returns the key columns
    plus ``diff_status``.

    NULL-SAFE comparison (``<=>``): a column going NULL→value or
    value→NULL counts as changed, NULL→NULL as unchanged — plain ``=``
    would silently label both as changed-or-not-at-all depending on
    engine NULL semantics.  Keys must be unique per side (a duplicated
    key would fan the full-outer join; enforce upstream with
    dedup_exact).

    Scale: ONE full-outer equi-join on the key — co-partitioned both
    sides, no broadcast assumption (both snapshots are corpus-scale);
    Catalyst plans a sort-merge join, the right shape at 100 TB."""
    if not key_cols or not compare_cols:
        raise ValueError("snapshot_diff requires key_cols and compare_cols")
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in key_cols],
        *[F.col(c).alias(f"__oc_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"__nc_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    cond = None
    for k in key_cols:
        # eqNullSafe, not ==: a NULL-keyed row present on both sides is
        # the SAME row (matched, then compared), not a spurious
        # added+removed pair — the advertised NULL-safe semantics cover
        # the keys too
        c = F.col(f"__ok_{k}").eqNullSafe(F.col(f"__nk_{k}"))
        cond = c if cond is None else (cond & c)
    joined = o.join(n, cond, "full_outer")
    same = None
    for c in compare_cols:
        eq = F.col(f"__oc_{c}").eqNullSafe(F.col(f"__nc_{c}"))
        same = eq if same is None else (same & eq)
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        *[
            F.coalesce(F.col(f"__nk_{k}"), F.col(f"__ok_{k}")).alias(k)
            for k in key_cols
        ],
        status.alias("diff_status"),
    )


# --- join cardinality audit -----------------------------------------------------


def join_explosion_audit(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Pre-flight audit for an equi-join: the EXACT output cardinality
    each key would contribute (``n_left · n_right``) and its share of
    the total — run it before a production join to catch the skewed /
    exploding keys that turn a shuffle into one straggler task (the
    companion of key_skew_report, which audits one table; this audits
    the PAIR).  Returns the ``top_k`` keys by contribution:
    (key, n_left, n_right, out_rows, share).

    NULL keys are excluded (an inner equi-join drops them anyway).
    Scale: each side collapses to its per-key count FIRST (map-side
    partial aggregation), so the join here is count-table × count-table
    — never the fact tables; the 1-row total broadcasts."""
    if top_k <= 0:
        raise ValueError(f"join_explosion_audit: top_k must be positive, got {top_k}")
    lc = (
        left.filter(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_left"))
    )
    rc = (
        right.filter(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_right"))
    )
    prod = lc.join(rc, key_col).withColumn(
        "out_rows", (F.col("n_left") * F.col("n_right")).cast("long")
    )
    total = prod.agg(F.sum("out_rows").alias("__total"))
    return (
        prod.join(F.broadcast(total))
        .withColumn(
            "share",
            F.col("out_rows").cast("double") / F.col("__total").cast("double"),
        )
        .drop("__total")
        .orderBy(F.desc("out_rows"), F.asc(key_col))
        .limit(top_k)
    )


# --- dataset manifest -----------------------------------------------------------


def dataset_manifest(
    df: DataFrame,
    text_col: str = "text",
    source_col: str | None = None,
) -> DataFrame:
    """Dataset-card summary in ONE aggregation pass — the manifest a
    training-data release ships (and the first sanity check a consumer
    runs): long-format (metric, value) rows covering corpus size,
    NULL/empty text, character and whitespace-token totals, length
    extremes, and (optionally) distinct sources.

    All values are BIGINT (one column type — the long format is what
    makes the manifest APPENDABLE across snapshots for drift tracking).
    The token count mirrors functions.text.with_token_counts'
    whitespace rule exactly (trim == '' → 0; NULL → skipped), so the
    manifest agrees with every other token accounting in the repo.

    Scale: one map-side-combined aggregation over the corpus; the
    output is ~7 rows."""
    col = F.col(text_col)
    ws_count = F.when(F.trim(col) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(col), r"\s+"))
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(col.isNull(), 1).otherwise(0)).cast("long").alias("n_null_text"),
        F.sum(F.when(col.isNotNull() & (F.trim(col) == ""), 1).otherwise(0))
        .cast("long")
        .alias("n_empty_text"),
        F.coalesce(F.sum(F.length(col)), F.lit(0)).cast("long").alias("total_chars"),
        F.coalesce(F.sum(ws_count), F.lit(0)).cast("long").alias("total_ws_tokens"),
        F.coalesce(F.max(F.length(col)), F.lit(0)).cast("long").alias("max_chars"),
        F.coalesce(F.min(F.length(col)), F.lit(0)).cast("long").alias("min_chars"),
    ]
    names = [
        "n_docs", "n_null_text", "n_empty_text", "total_chars",
        "total_ws_tokens", "max_chars", "min_chars",
    ]
    if source_col:
        aggs.append(
            F.count_distinct(F.col(source_col)).cast("long").alias("n_sources")
        )
        names.append("n_sources")
    agg = df.agg(*aggs)
    stack = ", ".join(f"'{n}', {n}" for n in names)
    return agg.select(
        F.expr(f"stack({len(names)}, {stack}) AS (metric, value)")
    )


def mad_outliers(
    df: DataFrame,
    col: str,
    group_cols: list[str],
    *,
    k: float = 3.0,
) -> DataFrame:
    """Robust (median/MAD) outlier flagging — the heavy-tail companion
    of :func:`outlier_flags`: z-scores break when the outliers
    themselves inflate the stddev; the median absolute deviation does
    not.  Adds ``robust_z = (x − median) / (1.4826022185056018 · MAD)``
    and ``is_outlier = |robust_z| > k`` to every row (NULL input keeps
    its row with NULL score, zero-MAD strata flag nothing — score 0,
    matching outlier_flags' zero-variance rule).

    Two tiny per-stratum aggregates broadcast back onto the scan:
    exact interpolated medians (PERCENTILE_CONT — the proven
    robust_scale primitive) of x, then of |x − median|.  The 1.4826
    consistency constant (1/Φ⁻¹(3/4)) is a Python literal injected
    into both engines — no query-time distribution function.  Two
    corpus scans (the second pass needs the first's median), each with
    full map-side aggregation; joins broadcast at any corpus size
    because the build side is |strata| rows."""
    if col not in df.columns:
        raise ValueError(f"mad_outliers: unknown column {col!r}; available {df.columns}")
    missing = [g for g in group_cols if g not in df.columns]
    if missing:
        raise ValueError(f"mad_outliers: unknown group columns {missing}")
    def _nullsafe_join(left: DataFrame, right: DataFrame) -> DataFrame:
        # NULL group keys form their own stratum (the outlier_flags
        # rule; oracle mirrors with IS NOT DISTINCT FROM)
        cond = None
        for gcol in group_cols:
            c = left[gcol].eqNullSafe(right[f"_x_{gcol}"])
            cond = c if cond is None else cond & c
        j = left.join(F.broadcast(right), cond, "left")
        return j.drop(*[f"_x_{gcol}" for gcol in group_cols])

    med = df.groupBy(*group_cols).agg(
        F.percentile(F.col(col), F.lit(0.5)).alias("_x_med")
    )
    med = med.select(
        *[F.col(gcol).alias(f"_x_{gcol}") for gcol in group_cols], "_x_med"
    )
    with_med = _nullsafe_join(df, med)
    mad = (
        with_med.where(F.col(col).isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.percentile(F.abs(F.col(col) - F.col("_x_med")), F.lit(0.5)).alias(
                "_x_mad"
            )
        )
    )
    mad = mad.select(
        *[F.col(gcol).alias(f"_x_{gcol}") for gcol in group_cols], "_x_mad"
    )
    out = _nullsafe_join(with_med, mad)
    scale = F.lit(1.4826022185056018) * F.col("_x_mad")
    rz = F.when(F.col(col).isNull(), F.lit(None).cast("double")).when(
        F.col("_x_mad") == 0.0, F.lit(0.0)
    ).otherwise((F.col(col) - F.col("_x_med")) / scale)
    return (
        out.withColumn("robust_z", rz)
        .withColumn(
            "is_outlier",
            F.coalesce(F.abs(F.col("robust_z")) > F.lit(float(k)), F.lit(False)),
        )
        .drop("_x_med", "_x_mad")
    )


def mad_outliers_oracle_sql(
    inner_sql: str,
    col: str,
    group_cols: list[str],
    *,
    k: float = 3.0,
    out_cols: list[str] | None = None,
) -> str:
    """DuckDB mirror of :func:`mad_outliers` — same PERCENTILE_CONT
    medians, same literal constant and guard order."""
    g = ", ".join(group_cols)
    cols = ", ".join(f"t.{c}" for c in (out_cols or [col]))
    on_med = " AND ".join(f"m.{c} IS NOT DISTINCT FROM t.{c}" for c in group_cols)
    on_mad = " AND ".join(f"d.{c} IS NOT DISTINCT FROM t.{c}" for c in group_cols)
    return f"""
WITH base AS ({inner_sql}),
med AS (
  SELECT {g}, PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY {col}) AS med
  FROM base GROUP BY {g}),
mad AS (
  SELECT t.{group_cols[0]}{"".join(", t." + c for c in group_cols[1:])},
         PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY ABS(t.{col} - m.med)) AS mad
  FROM base t JOIN med m ON {on_med.replace('m.', 'm.').replace('t.', 't.')}
  WHERE t.{col} IS NOT NULL
  GROUP BY t.{group_cols[0]}{"".join(", t." + c for c in group_cols[1:])})
SELECT {cols},
       CASE WHEN t.{col} IS NULL THEN NULL
            WHEN d.mad = 0.0 THEN 0.0
            ELSE (t.{col} - m.med) / (1.4826022185056018 * d.mad)
       END AS robust_z,
       COALESCE(ABS(CASE WHEN t.{col} IS NULL THEN NULL
            WHEN d.mad = 0.0 THEN 0.0
            ELSE (t.{col} - m.med) / (1.4826022185056018 * d.mad)
       END) > {float(k)!r}, FALSE) AS is_outlier
FROM base t LEFT JOIN med m ON {on_med}
            LEFT JOIN mad d ON {on_mad}
"""
