"""Broadcast Bloom-filter membership gate — shuffle-free decontamination.

The exact contamination check (functions/curation.py) semi-joins the
corpus against the benchmark set: correct, but at 100 TB even a
broadcast semi join re-evaluates the join per stage and carries the
key set as a hash relation.  The classic scale alternative is a BLOOM
FILTER built once over the (small) benchmark side and evaluated as a
pure PROJECTION over the corpus scan: zero shuffles, zero joins, the
corpus never moves, and the filter itself is a few KB of bitmap
shipped inside the plan.  False positives are possible (tunable via
m/k); false negatives are not — exactly the guarantee a
decontamination pre-filter needs (drop-on-hit is conservative).

Engine-exactness: the k hash functions are the engine-portable
md5-prefix fold used everywhere in this repo
(Spark ``conv(substring(md5(s || '#bi'), 1, 8), 16, 10)`` ==
DuckDB ``('0x' || substr(md5(s || '#bi'), 1, 8))::BIGINT``), so the
bitmap — and therefore every false positive — is deterministic and
the whole gate hash-matches a generated SQL oracle.  The oracle
mirrors the SEMANTICS (all k bit positions present in the benchmark
side's position set) rather than re-packing words, which is the same
predicate by construction.

Scale notes:
- build: the benchmark side explodes to (k x |eval|) positions, one
  shuffle to distinct+pack ≤ m/64 words, collected to the driver
  (bounded by m — 8 KB at m=2^16 — NOT by data size).
- serve: a literal array<bigint> in the plan; membership is k md5s +
  k element_at/shift probes per row inside whole-stage codegen.  No
  join, no shuffle, no broadcast exchange even.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BLOOM_M = 1 << 16  # bits
DEFAULT_BLOOM_K = 3


def long_array_lit(values: list[int]) -> Column:
    """array<bigint> plan literal from python ints.  Explicit `NL`
    long literals: F.lit() over a python list would type small values
    INT and >2^31 values LONG and refuse the mix.  Shared by the Bloom
    bitmap and the HLL linear-counting table (functions/sketch.py)."""
    return F.expr("array(" + ",".join(f"{v}L" for v in values) + ")")


def _hash_suffix(i: int) -> str:
    return f"#b{i}"


def bloom_position(col: Column, i: int, m: int) -> Column:
    """i-th Bloom bit position of a string column: md5-prefix fold of
    the value with a per-hash suffix, mod m.  NULL in -> NULL out
    (concat propagates NULL, matching DuckDB ``||``)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(col, F.lit(_hash_suffix(i)))), 1, 8), 16, 10
        ).cast("long")
        % m
    )


def build_bloom_bitmap(
    df: DataFrame, col: str, *, m: int = DEFAULT_BLOOM_M, k: int = DEFAULT_BLOOM_K
) -> list[int]:
    """Build the word-packed bitmap (m/64 BIGINTs) over ``df[col]`` —
    a small driver-side list, bounded by m regardless of data size.
    NULL values set no bits (they can never match on the serve side
    either)."""
    if m % 64 != 0:
        raise ValueError(f"bloom m must be a multiple of 64, got {m}")
    pos = (
        df.select(
            F.explode(
                F.array(*[bloom_position(F.col(col), i, m) for i in range(k)])
            ).alias("p")
        )
        .where(F.col("p").isNotNull())
        .distinct()
    )
    rows = (
        pos.groupBy(F.expr("p DIV 64").alias("w"))
        .agg(F.expr("bit_or(shiftleft(1L, CAST(p % 64 AS INT)))").alias("bits"))
        .collect()
    )
    bitmap = [0] * (m // 64)
    for r in rows:
        bitmap[int(r["w"])] = int(r["bits"])
    return bitmap


def with_bloom_flag(
    df: DataFrame,
    col: str,
    bitmap: list[int],
    *,
    m: int = DEFAULT_BLOOM_M,
    k: int = DEFAULT_BLOOM_K,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Append ``out_col`` (1 iff all k bit probes hit; NULL values and
    misses get 0).  Pure projection — the plan is scan + codegen, no
    exchange of any kind."""
    if len(bitmap) != m // 64:
        raise ValueError(f"bitmap has {len(bitmap)} words, expected {m // 64}")
    probe_cols = {f"__bp{i}__": bloom_position(F.col(col), i, m) for i in range(k)}
    collisions = ({"__bm__", out_col} | probe_cols.keys()) & set(df.columns)
    if collisions:
        raise ValueError(
            "with_bloom_flag: input already has column(s) "
            f"{sorted(collisions)} — rename them (or pass a different "
            "out_col) before gating; silently overwriting would clobber "
            "a prior gate's output"
        )
    probed = df.withColumns({"__bm__": long_array_lit(bitmap), **probe_cols})
    # shiftright with a column shift amount needs the SQL function form
    # (the pyspark wrapper only accepts a literal int).
    tests = [
        f"(shiftright(element_at(__bm__, CAST(__bp{i}__ DIV 64 AS INT) + 1),"
        f" CAST(__bp{i}__ % 64 AS INT)) & 1) = 1"
        for i in range(k)
    ]
    hit = F.expr(" AND ".join(tests))
    return probed.withColumn(
        out_col, F.when(F.coalesce(hit, F.lit(False)), F.lit(1)).otherwise(F.lit(0))
    ).drop("__bm__", *probe_cols.keys())


def bloom_gate_oracle_sql(
    *,
    corpus_sql: str,
    eval_sql: str,
    id_col: str,
    text_col: str,
    m: int = DEFAULT_BLOOM_M,
    k: int = DEFAULT_BLOOM_K,
) -> str:
    """Generated DuckDB oracle: a corpus row hits the Bloom filter iff
    ALL k of its bit positions appear in the benchmark side's position
    set — the exact predicate the packed bitmap evaluates (same m, k,
    and hash suffixes by construction, so false positives reproduce
    too).  ``corpus_sql`` / ``eval_sql`` are subqueries yielding
    (id_col, text_col) and (text_col) respectively."""

    def pos_sql(text: str, i: int) -> str:
        return (
            f"(('0x' || substr(md5({text} || '{_hash_suffix(i)}'), 1, 8))::BIGINT"
            f" % {m})"
        )

    eval_positions = " UNION ".join(
        f"SELECT {pos_sql('t', i)} AS p FROM __bg_ev WHERE t IS NOT NULL"
        for i in range(k)
    )
    corpus_positions = " UNION ALL ".join(
        f"SELECT t, {pos_sql('t', i)} AS p FROM __bg_ctexts"
        for i in range(k)
    )
    # CTE names are __bg_-prefixed so a caller whose corpus_sql reads a
    # table literally named "corpus"/"ev"/"hits" doesn't bind circularly.
    # hits are computed per distinct TEXT (the probe is a pure function
    # of the text), then joined back to corpus rows — correct even when
    # id_col is not unique (per-id grouping would pool bit positions
    # across different texts sharing an id).
    return f"""
WITH __bg_corpus AS (SELECT {id_col} AS id, {text_col} AS t FROM ({corpus_sql})),
__bg_ctexts AS (SELECT DISTINCT t FROM __bg_corpus WHERE t IS NOT NULL),
__bg_ev AS (SELECT {text_col} AS t FROM ({eval_sql})),
__bg_evpos AS ({eval_positions}),
__bg_cpos AS ({corpus_positions}),
__bg_hits AS (
  SELECT t FROM __bg_cpos JOIN __bg_evpos USING (p) GROUP BY t HAVING COUNT(*) = {k}
)
SELECT c.id AS {id_col},
       CASE WHEN h.t IS NULL THEN 0 ELSE 1 END AS bloom_hit
FROM __bg_corpus c LEFT JOIN __bg_hits h ON c.t = h.t
"""
