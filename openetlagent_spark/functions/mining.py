"""Pattern-mining operators: directed association rules (market-basket
confidence / lift), Markov next-event transition matrices, and the
skyline (Pareto frontier) operator.

The reference engine (app/main.py's 11-operator surface) has no mining
vocabulary at all — these extend the analytics family the way
collocations / cooccurrence_pairs did, and follow the same exactness
playbook (memory: oracle-exactness-patterns):

* every score is a FIXED-ORDER arithmetic tree over exact BIGINT
  counts — one or two IEEE multiplies and one divide, no libm, so both
  engines produce bit-identical doubles;
* ordering always carries a full deterministic tie-break;
* NULL keys are filtered up front on BOTH sides (Spark groupBy would
  emit a NULL-key group where SQL joins / DISTINCT would not).

Scale shapes are documented per function; none of them ever performs a
corpus×corpus join — baskets collapse to per-user sorted sets bounded
by the item vocabulary, transitions are one window + one vocab²-sized
count, and the skyline prunes through deterministic hash buckets before
the single global ordering pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# association rules
# ---------------------------------------------------------------------------

def association_rules(
    df: DataFrame,
    basket_col: str = "user_id",
    item_col: str = "event_type",
    min_count: int = 2,
    k: int = 100,
) -> DataFrame:
    """Directed association rules ``antecedent → consequent`` over the
    (basket, item) pairs of ``df``: for every ordered pair of distinct
    items co-occurring in at least ``min_count`` baskets, emit

    * ``n_pair``  — baskets containing both items (BIGINT),
    * ``n_ante`` / ``n_cons`` — baskets containing each item alone,
    * ``support``    = n_pair / n_baskets            (one divide),
    * ``confidence`` = n_pair / n_ante               (one divide),
    * ``lift``       = (n_pair · n_baskets) / (n_ante · n_cons)
                       (two multiplies, one divide, fixed order),

    ranked by (lift DESC, confidence DESC, antecedent, consequent) and
    cut to the top ``k``.  All three metrics are single fixed-order
    double expressions over exact integer counts — bit-identical across
    engines, no logarithms (which is why the score is the lift RATIO,
    never log-lift).

    Scale shape (100 TB): the corpus collapses straight to per-basket
    SORTED item sets in ONE aggregation (``collect_set`` dedups, so no
    separate DISTINCT shuffle) — bounded by the item vocabulary, so
    the set cannot blow up.  ONE explode then emits every directed
    pair PLUS a self-pair ``(a, a)`` marker per basket item (self
    rules never exist, so the diagonal is a free marginal channel),
    and a single vocabulary²-sized count covers pair counts AND item
    marginals together.  That small count table goes through the
    engine's materialize() boundary (it feeds both sides of the rule
    join — without the boundary each branch would recompute the
    corpus aggregation), and the 1-row basket total is the only other
    corpus-touching aggregate.  Marginals and the total enter the
    rule join as broadcasts.
    """
    if k <= 0 or min_count < 1:
        raise ValueError(
            f"association_rules needs k > 0 and min_count >= 1, got {k!r}/{min_count!r}"
        )
    from ..session import materialize

    # per-basket sorted item set (vocabulary-bounded), then every
    # ordered pair of DISTINCT items — plus the (a, a) marginal
    # marker per item — expands scan-locally
    sets = (
        df.filter(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .select(F.col(basket_col).alias("basket"), F.col(item_col).alias("item"))
        .groupBy("basket")
        .agg(F.array_sort(F.collect_set("item")).alias("items"))
    )
    pairs = F.expr(
        "concat("
        "flatten(transform(items, a -> "
        "transform(filter(items, b -> b != a), b -> struct(a AS ante, b AS cons)))), "
        "transform(items, a -> struct(a AS ante, a AS cons)))"
    )
    counts = materialize(
        sets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.ante").alias("antecedent"), F.col("p.cons").alias("consequent"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
    )
    pc = counts.filter(F.col("antecedent") != F.col("consequent"))
    ic = counts.filter(F.col("antecedent") == F.col("consequent")).select(
        F.col("antecedent").alias("item"), F.col("n_pair").alias("n_item")
    )
    total = (
        df.filter(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .agg(F.countDistinct(basket_col).cast("long").alias("n_baskets"))
    )
    joined = (
        pc.join(F.broadcast(ic.withColumnRenamed("item", "antecedent")
                            .withColumnRenamed("n_item", "n_ante")), "antecedent")
        .join(F.broadcast(ic.withColumnRenamed("item", "consequent")
                          .withColumnRenamed("n_item", "n_cons")), "consequent")
        .crossJoin(F.broadcast(total))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    scored = joined.select(
        "antecedent", "consequent", "n_pair", "n_ante", "n_cons",
        (d("n_pair") / d("n_baskets")).alias("support"),
        (d("n_pair") / d("n_ante")).alias("confidence"),
        ((d("n_pair") * d("n_baskets")) / (d("n_ante") * d("n_cons"))).alias("lift"),
    )
    return (
        scored.filter(F.col("n_pair") >= min_count)
        .orderBy(F.desc("lift"), F.desc("confidence"),
                 F.asc("antecedent"), F.asc("consequent"))
        .limit(k)
    )


def association_rules_oracle_sql(
    table: str = "events",
    basket_col: str = "user_id",
    item_col: str = "event_type",
    min_count: int = 2,
    k: int = 100,
) -> str:
    """DuckDB mirror of :func:`association_rules` — directed pairs via
    an equi-self-join of the DISTINCT basket/item table (same rows the
    Spark array expansion produces), identical fixed-order metric
    arithmetic, identical tie-broken cut."""
    return f"""
WITH ut AS (SELECT DISTINCT {basket_col} AS basket, {item_col} AS item
            FROM {table}
            WHERE {basket_col} IS NOT NULL AND {item_col} IS NOT NULL),
n AS (SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n_baskets FROM ut),
ic AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_item FROM ut GROUP BY item),
pc AS (SELECT a.item AS antecedent, b.item AS consequent,
              CAST(COUNT(*) AS BIGINT) AS n_pair
       FROM ut a JOIN ut b ON a.basket = b.basket AND a.item <> b.item
       GROUP BY 1, 2)
SELECT antecedent, consequent, n_pair,
       ia.n_item AS n_ante, ic2.n_item AS n_cons,
       CAST(n_pair AS DOUBLE) / CAST(n.n_baskets AS DOUBLE) AS support,
       CAST(n_pair AS DOUBLE) / CAST(ia.n_item AS DOUBLE) AS confidence,
       (CAST(n_pair AS DOUBLE) * CAST(n.n_baskets AS DOUBLE))
       / (CAST(ia.n_item AS DOUBLE) * CAST(ic2.n_item AS DOUBLE)) AS lift
FROM pc
JOIN ic ia ON ia.item = pc.antecedent
JOIN ic ic2 ON ic2.item = pc.consequent
CROSS JOIN n
WHERE n_pair >= {min_count}
ORDER BY lift DESC, confidence DESC, antecedent, consequent
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Markov transition matrix
# ---------------------------------------------------------------------------

def markov_transitions(
    df: DataFrame,
    seq_col: str = "user_id",
    order_col: str = "ts",
    tiebreak_col: str = "event_id",
    state_col: str = "event_type",
) -> DataFrame:
    """First-order Markov transition matrix over per-sequence event
    streams: for every observed (src, dst) state pair, the transition
    count, the source's outgoing total, and the maximum-likelihood
    probability ``prob = n_trans / n_src`` (ONE IEEE division over
    exact BIGINTs — engine-identical).

    Successor pairs come from ``lead(state)`` over each sequence
    ordered by (``order_col``, ``tiebreak_col``) — the explicit
    tie-break makes equal timestamps deterministic.  NULL sequence ids
    and NULL states are dropped up front (a NULL state would be
    indistinguishable from end-of-sequence after the lead), and so are
    NULL order/tie-break values: an event with no position has no
    defined place in the sequence, and leaving it in would also be an
    engine-divergence trap (Spark ASC sorts NULLS FIRST, DuckDB
    defaults NULLS LAST).

    Scale shape (100 TB): one shuffle to co-locate each sequence
    (exactly the sessionize layout), the lead is a sort-local window,
    and the transition count collapses to a state-vocabulary²-sized
    table with map-side partial aggregation; the per-source totals are
    window sums over that small table, never the corpus.  Output is the
    full matrix (vocab² rows), ordered (src, prob DESC, dst).
    """
    w = Window.partitionBy("seq").orderBy(F.asc(order_col), F.asc(tiebreak_col))
    steps = (
        df.filter(
            F.col(seq_col).isNotNull()
            & F.col(state_col).isNotNull()
            & F.col(order_col).isNotNull()
            & F.col(tiebreak_col).isNotNull()
        )
        .select(
            F.col(seq_col).alias("seq"),
            F.col(order_col),
            F.col(tiebreak_col),
            F.col(state_col).alias("src"),
        )
        .withColumn("dst", F.lead("src").over(w))
        .filter(F.col("dst").isNotNull())
    )
    counts = steps.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("n_trans")
    )
    n_src = F.sum("n_trans").over(Window.partitionBy("src")).cast("long")
    return (
        counts.select(
            "src", "dst", "n_trans", n_src.alias("n_src"),
            (F.col("n_trans").cast("double") / n_src.cast("double")).alias("prob"),
        )
        .orderBy(F.asc("src"), F.desc("prob"), F.asc("dst"))
    )


def markov_transitions_oracle_sql(
    table: str = "events",
    seq_col: str = "user_id",
    order_col: str = "ts",
    tiebreak_col: str = "event_id",
    state_col: str = "event_type",
) -> str:
    """DuckDB mirror of :func:`markov_transitions` — same lead window
    with the same (order, tiebreak) ordering, same integer counts and
    single-division probability."""
    return f"""
WITH steps AS (
  SELECT {state_col} AS src,
         lead({state_col}) OVER (PARTITION BY {seq_col}
                                 ORDER BY {order_col} ASC, {tiebreak_col} ASC) AS dst
  FROM {table}
  WHERE {seq_col} IS NOT NULL AND {state_col} IS NOT NULL
    AND {order_col} IS NOT NULL AND {tiebreak_col} IS NOT NULL),
c AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n_trans
      FROM steps WHERE dst IS NOT NULL GROUP BY src, dst)
SELECT src, dst, n_trans,
       CAST(SUM(n_trans) OVER (PARTITION BY src) AS BIGINT) AS n_src,
       CAST(n_trans AS DOUBLE)
       / CAST(CAST(SUM(n_trans) OVER (PARTITION BY src) AS BIGINT) AS DOUBLE) AS prob
FROM c
ORDER BY src ASC, prob DESC, dst ASC
"""


# ---------------------------------------------------------------------------
# skyline (Pareto frontier)
# ---------------------------------------------------------------------------

def skyline2d(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    prune_buckets: int = 32,
) -> DataFrame:
    """2-D skyline (Pareto frontier, maximizing both axes): rows not
    dominated by any other row, where q dominates p iff
    ``q.x >= p.x AND q.y >= p.y`` with at least one strict inequality.
    Ties on BOTH axes survive together (neither dominates).  Output is
    (id, x, y) ordered (x DESC, y DESC, id ASC).

    The sort-based formulation replaces the naive quadratic
    NOT-EXISTS self-join: a row survives iff

    * ``y = MAX(y) OVER (PARTITION BY x)``  — best in its own x-group
      (kills same-x strict-y domination), and
    * ``y > MAX(y) OVER (ORDER BY x RANGE BETWEEN 1 FOLLOWING AND
      UNBOUNDED FOLLOWING)`` — beats every strictly-greater-x row
      (NULL frame = no greater x = survives).

    Both windows are integer comparisons — no arithmetic at all, so
    exactness is trivial.

    Scale shape (100 TB): the global RANGE window needs a total order,
    which on one pass would funnel the corpus through a single
    partition.  Stage 1 therefore applies the SAME two-window test
    inside ``pmod(hash(id), prune_buckets)`` groups first — a row
    dominated inside any subset is dominated globally, so the bucket
    pass is a LOSSLESS filter that shrinks the input to at most
    ``buckets × |local frontier|`` rows; only those survivors enter the
    global single-partition pass.  The oracle runs the global
    definition alone, proving the pruning drops nothing.  Rows with a
    NULL on either axis are excluded up front (domination is undefined
    on NULL).
    """
    if prune_buckets < 1:
        raise ValueError(f"skyline2d needs prune_buckets >= 1, got {prune_buckets!r}")
    # The strictly-greater-x window is RANGE BETWEEN 1 FOLLOWING AND
    # UNBOUNDED — a unit step, sound ONLY for integral x.  On a
    # double/decimal x a dominator at x + 0.5 would fall OUTSIDE the
    # frame and a dominated row would silently survive (and the
    # mirrored oracle would agree, so parity masks the wrong answer).
    # Refuse loudly; quantize fractional axes to integers first.
    x_type = dict(df.dtypes).get(x_col, "")
    if x_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"skyline2d needs an INTEGRAL x column (the RANGE frame steps "
            f"by 1); {x_col!r} is {x_type!r} — quantize it to integers "
            "first (e.g. FLOOR(x * 2^k))"
        )
    base = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.col(x_col).alias("x"),
            F.col(y_col).alias("y"),
        )
    )

    def frontier(frame: DataFrame, *, bucketed: bool) -> DataFrame:
        part = ["bucket"] if bucketed else []
        gx = F.max("y").over(Window.partitionBy(*part, "x"))
        greater = (
            Window.partitionBy(*part)
            .orderBy(F.asc("x"))
            .rangeBetween(1, Window.unboundedFollowing)
        )
        m = F.max("y").over(greater)
        return frame.withColumn("_gx", gx).withColumn("_m", m).filter(
            (F.col("y") == F.col("_gx"))
            & (F.col("_m").isNull() | (F.col("y") > F.col("_m")))
        ).drop("_gx", "_m")

    pruned = frontier(
        base.withColumn(
            "bucket", F.pmod(F.xxhash64(F.col("id")), F.lit(prune_buckets))
        ),
        bucketed=True,
    ).drop("bucket")
    return frontier(pruned, bucketed=False).orderBy(
        F.desc("x"), F.desc("y"), F.asc("id")
    )


def skyline2d_oracle_sql(inner_sql: str) -> str:
    """DuckDB mirror of :func:`skyline2d` over ``inner_sql`` (must
    yield columns ``id, x, y``) — the GLOBAL two-window definition
    only; the Spark side's bucket pre-pass is a lossless prune, so the
    single-pass oracle doubles as the proof it drops nothing."""
    return f"""
WITH base AS ({inner_sql}),
w AS (SELECT id, x, y,
             MAX(y) OVER (PARTITION BY x) AS gx,
             MAX(y) OVER (ORDER BY x RANGE BETWEEN 1 FOLLOWING
                          AND UNBOUNDED FOLLOWING) AS m
      FROM base WHERE x IS NOT NULL AND y IS NOT NULL)
SELECT id, x, y FROM w
WHERE y = gx AND (m IS NULL OR y > m)
ORDER BY x DESC, y DESC, id ASC
"""


def item_similarity(
    events: DataFrame,
    user_col: str,
    item_col: str,
) -> DataFrame:
    """Item–item cosine similarity over binary user–item incidence:
    ``cos(a, b) = |U_a ∩ U_b| / sqrt(|U_a| · |U_b|)`` for every item
    pair with at least one shared user — the memory-based
    collaborative-filtering kernel (Sarwar et al. 2001), and the
    normalized companion of the raw co-occurrence counts
    (plans/analytics.py q_cooccurrence_pairs keeps support;
    this keeps popularity-corrected similarity).

    Shape mirrors the co-occurrence query: distinct (user, item) →
    per-user sorted item array (bounded by the item vocabulary) →
    pair expand → one vocabulary²-bounded count; per-item user counts
    (|items| rows) join onto the pair table — AQE broadcasts.  The
    cosine is sqrt of an exact integer product — correctly-rounded
    IEEE on both engines."""
    e = (
        events.filter(F.col(user_col).isNotNull() & F.col(item_col).isNotNull())
        .select(F.col(user_col).alias("_x_u"), F.col(item_col).alias("_x_i"))
        .distinct()
    )
    deg = e.groupBy("_x_i").agg(F.count(F.lit(1)).alias("n_users"))
    per_user = e.groupBy("_x_u").agg(F.array_sort(F.collect_set("_x_i")).alias("items"))
    items = F.col("items")
    pair_expr = F.flatten(
        F.transform(
            items,
            lambda a: F.transform(
                F.filter(items, lambda b: b > a),
                lambda b: F.struct(a.alias("item_a"), b.alias("item_b")),
            ),
        )
    )
    co = (
        per_user.select(F.explode(pair_expr).alias("p"))
        .groupBy("p.item_a", "p.item_b")
        .agg(F.count(F.lit(1)).alias("users_both"))
    )
    da = deg.select(F.col("_x_i").alias("item_a"), F.col("n_users").alias("_x_na"))
    db = deg.select(F.col("_x_i").alias("item_b"), F.col("n_users").alias("_x_nb"))
    return (
        co.join(da, "item_a")
        .join(db, "item_b")
        .select(
            "item_a",
            "item_b",
            "users_both",
            (
                F.col("users_both").cast("double")
                / F.sqrt((F.col("_x_na") * F.col("_x_nb")).cast("double"))
            ).alias("cosine"),
        )
    )


def item_similarity_oracle_sql(table: str, user_col: str, item_col: str) -> str:
    """DuckDB mirror of :func:`item_similarity` — integer product under
    one sqrt, one division, same tree."""
    return f"""
WITH e AS (
  SELECT DISTINCT {user_col} AS u, {item_col} AS i FROM {table}
  WHERE {user_col} IS NOT NULL AND {item_col} IS NOT NULL),
deg AS (SELECT i, COUNT(*) AS n_users FROM e GROUP BY i),
co AS (
  SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS users_both
  FROM e a JOIN e b ON a.u = b.u AND a.i < b.i
  GROUP BY 1, 2)
SELECT item_a, item_b, users_both,
       CAST(users_both AS DOUBLE)
         / sqrt(CAST(da.n_users * db.n_users AS DOUBLE)) AS cosine
FROM co JOIN deg da ON da.i = item_a JOIN deg db ON db.i = item_b
"""


def target_encode_loo(
    df: DataFrame,
    category_col: str,
    target_col: str,
    *,
    output_col: str = "te_loo",
) -> DataFrame:
    """Leave-one-out target encoding — the feature-engineering
    primitive for high-cardinality categoricals: each row gets its
    category's mean target EXCLUDING the row itself
    (``(Σy − y) / (n − 1)``), which blocks the single-row leakage that
    plain mean encoding trains on.  Rows in singleton categories fall
    back to the GLOBAL mean computed over the other rows (the same
    leave-one-out rule, so no row ever sees its own target).

    One (category) aggregate joined back onto the corpus — AQE
    broadcasts the category table when small, co-partitioned hash join
    otherwise; sums are exact DECIMAL (order-free), the encode is one
    fixed double tree per row.  Appends ``output_col``; NULL targets
    are excluded from the sums and encode to NULL."""
    yd = F.col(target_col).cast("decimal(18,6)")
    stats = (
        df.where(F.col(target_col).isNotNull())
        .groupBy(F.col(category_col).alias("_x_cat"))
        .agg(F.count(F.lit(1)).alias("_x_n"), F.sum(yd).alias("_x_s"))
    )
    g = (
        df.where(F.col(target_col).isNotNull())
        .agg(F.count(F.lit(1)).alias("_x_gn"), F.sum(yd).alias("_x_gs"))
    )
    joined = df.join(
        stats, df[category_col] == stats["_x_cat"], "left"
    ).drop("_x_cat").crossJoin(F.broadcast(g))
    y = F.col(target_col).cast("double")
    loo = (F.col("_x_s").cast("double") - y) / (F.col("_x_n") - F.lit(1)).cast(
        "double"
    )
    g_loo = (F.col("_x_gs").cast("double") - y) / (F.col("_x_gn") - F.lit(1)).cast(
        "double"
    )
    # The global fallback needs gn > 1: with exactly one non-null target
    # in the whole frame a singleton-category row would compute 0/0 (NaN)
    # or x/0 (±Inf), and the cross-engine hash would then hinge on
    # DuckDB's ieee_floating_point_ops setting — encode the degenerate
    # case to NULL instead (mirrored in the oracle CASE below).
    encoded = (
        F.when(F.col(target_col).isNull(), F.lit(None).cast("double"))
        .when(F.col("_x_n") > 1, loo)
        .when(F.col("_x_gn") > 1, g_loo)
        .otherwise(F.lit(None).cast("double"))
    )
    return joined.withColumn(output_col, encoded).drop(
        "_x_n", "_x_s", "_x_gn", "_x_gs"
    )


def target_encode_loo_oracle_sql(
    inner_sql: str,
    category_col: str,
    target_col: str,
    *,
    out_cols: list[str],
    output_col: str = "te_loo",
) -> str:
    """DuckDB mirror of :func:`target_encode_loo` (decimal sums via
    the VARCHAR bridge, identical guard order)."""
    cols = ", ".join(f"t.{c}" for c in out_cols)
    return f"""
WITH base AS ({inner_sql}),
s AS (
  SELECT {category_col} AS cat, COUNT(*) AS n,
         SUM(CAST({target_col} AS DECIMAL(18,6))) AS sm
  FROM base WHERE {target_col} IS NOT NULL GROUP BY 1),
g AS (
  SELECT COUNT(*) AS gn, SUM(CAST({target_col} AS DECIMAL(18,6))) AS gs
  FROM base WHERE {target_col} IS NOT NULL)
SELECT {cols},
       CASE WHEN t.{target_col} IS NULL THEN NULL
            WHEN s.n > 1 THEN
              (CAST(CAST(s.sm AS VARCHAR) AS DOUBLE) - CAST(t.{target_col} AS DOUBLE))
                / CAST(s.n - 1 AS DOUBLE)
            WHEN g.gn > 1 THEN
              (CAST(CAST(g.gs AS VARCHAR) AS DOUBLE) - CAST(t.{target_col} AS DOUBLE))
                / CAST(g.gn - 1 AS DOUBLE)
            ELSE NULL
       END AS {output_col}
FROM base t LEFT JOIN s ON s.cat = t.{category_col} CROSS JOIN g
"""
