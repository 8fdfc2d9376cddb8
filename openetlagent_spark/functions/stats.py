"""Two-cohort experiment statistics — the generic, parameterized
versions of the `ab_test` / `ks_test` harness queries (which pin the
purchase-vs-click instantiation against exact oracles): Welch z on
means, Kolmogorov–Smirnov on distribution shape.  Both follow the
repo-wide exactness discipline — integer/decimal accumulation, one
fixed IEEE double tree at the end — and both are single-corpus-pass
shapes that survive 100 TB (the KS running sums ride
functions/curation.py two_phase_prefix_sums, never a single-task
global ORDER-BY window).

No reference analog (the reference has no aggregation at all) — north
star extension for experiment readouts over event streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["welch_z_test", "ks_two_sample"]


def welch_z_test(
    df: DataFrame,
    cohort_col: str,
    cohort_a: str,
    cohort_b: str,
    value_col: str,
) -> DataFrame:
    """Welch two-sample z-test between cohorts ``a`` and ``b`` of
    ``value_col``: one row ``(n_a, mean_a, var_a, n_b, mean_b, var_b,
    z_score)``.  Both cohorts' power sums come from ONE conditional
    single-pass aggregate (map-side combinable); sample variance is
    ``(Σy² − (Σy)²/n)/(n−1)`` from exact DECIMAL sums; the z-score is
    one fixed double tree.  NULL values are excluded."""
    ev = df.where(
        F.col(cohort_col).isin(cohort_a, cohort_b) & F.col(value_col).isNotNull()
    )
    vd = F.col(value_col).cast("decimal(18,6)")
    v2 = (vd * vd).cast("decimal(38,6)")
    is_a = F.col(cohort_col) == cohort_a
    zero = F.lit(0).cast("decimal(18,6)")
    zero2 = F.lit(0).cast("decimal(38,6)")
    agg = ev.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(is_a, vd).otherwise(zero)).alias("_sa"),
        F.sum(F.when(is_a, v2).otherwise(zero2)).alias("_s2a"),
        F.sum(F.when(~is_a, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(~is_a, vd).otherwise(zero)).alias("_sb"),
        F.sum(F.when(~is_a, v2).otherwise(zero2)).alias("_s2b"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    sa = F.col("_sa").cast("double")
    sb = F.col("_sb").cast("double")
    s2a = F.col("_s2a").cast("double")
    s2b = F.col("_s2b").cast("double")
    ma = sa / na
    mb = sb / nb
    va = (s2a - sa * sa / na) / (na - F.lit(1.0))
    vb = (s2b - sb * sb / nb) / (nb - F.lit(1.0))
    return agg.select(
        "n_a",
        ma.alias("mean_a"),
        va.alias("var_a"),
        "n_b",
        mb.alias("mean_b"),
        vb.alias("var_b"),
        ((ma - mb) / F.sqrt(va / na + vb / nb)).alias("z_score"),
    )


def ks_two_sample(
    df: DataFrame,
    cohort_col: str,
    cohort_a: str,
    cohort_b: str,
    value_col: str,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between cohorts:
    one row ``(n_a, n_b, ks_d, ks_stat)`` with
    ``ks_d = max |ECDF_a − ECDF_b|`` over pooled observed values and
    ``ks_stat = ks_d · sqrt(na·nb/(na+nb))``.  Corpus → per-value
    cohort counts (one exchange) → two-phase prefix sums (pid-local
    cumulative windows) → order-free MAX."""
    from .curation import two_phase_prefix_sums

    ev = df.where(
        F.col(cohort_col).isin(cohort_a, cohort_b) & F.col(value_col).isNotNull()
    )
    v = ev.groupBy(F.col(value_col).alias("x")).agg(
        F.sum((F.col(cohort_col) == cohort_a).cast("long")).alias("ca"),
        F.sum((F.col(cohort_col) == cohort_b).cast("long")).alias("cb"),
    )
    cum = two_phase_prefix_sums(v, [F.col("x")], ["ca", "cb"])
    totals = v.agg(
        F.sum("ca").cast("long").alias("n_a"), F.sum("cb").cast("long").alias("n_b")
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    ecdf_gap = F.abs(
        F.col("_x_cum_ca").cast("double") / na
        - F.col("_x_cum_cb").cast("double") / nb
    )
    d = cum.crossJoin(F.broadcast(totals)).agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.max(ecdf_gap).alias("ks_d"),
    )
    return d.select(
        "n_a",
        "n_b",
        "ks_d",
        (
            F.col("ks_d")
            * F.sqrt(
                F.col("n_a").cast("double")
                * F.col("n_b").cast("double")
                / (F.col("n_a") + F.col("n_b")).cast("double")
            )
        ).alias("ks_stat"),
    )
