"""Logical type system: the reference's six logical types mapped to Spark.

The reference declares exactly six logical types in YAML schemas and maps
them to Polars dtypes (reference: app/models.py:6-13,23).  Here the same
logical names map to Spark SQL types; ``positive integer`` is an alias of
``integer`` with no constraint enforced (reference: app/main.py:318-320).

Beyond the reference's flat six-type universe, this engine also exposes
nested types needed by the large-scale extensions (``embedding`` =
array<float>, ``binary`` for multimodal payloads, ``timestamp`` for event
streams) — the reference has no nested types at all (app/models.py:23 is
its complete universe), so these are additive.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Reference-parity logical types (app/models.py:6-13).
SPARK_TYPE_MAP: dict[str, T.DataType] = {
    "string": T.StringType(),
    "integer": T.LongType(),
    "float": T.DoubleType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "positive integer": T.LongType(),
    # Engine extensions (not in the reference's 6-type system):
    "timestamp": T.TimestampType(),
    "binary": T.BinaryType(),
    "embedding": T.ArrayType(T.FloatType()),
}

# Reverse map for error messages; integer wins over positive integer, like
# the reference's dict-inversion collapse (app/models.py:14-16).
SPARK_TYPE_MAP_REVERSE: dict[str, str] = {
    str(v): k for k, v in reversed(list(SPARK_TYPE_MAP.items()))
}

REFERENCE_LOGICAL_TYPES = (
    "string",
    "integer",
    "float",
    "boolean",
    "date",
    "positive integer",
)


def logical_to_spark(logical: str) -> T.DataType:
    """Map a logical type name to its Spark type; raise on unknown names."""
    try:
        return SPARK_TYPE_MAP[logical]
    except KeyError:
        raise ValueError(
            f"Unknown logical type '{logical}'. "
            f"Expected one of: {sorted(SPARK_TYPE_MAP)}"
        ) from None


def schema_to_struct(columns: dict[str, str]) -> T.StructType:
    """Build a StructType from ``{column_name: logical_type}``.

    Mirrors the reference's declared-schema loading (app/main.py:361-394):
    every field nullable, declared order preserved.
    """
    return T.StructType(
        [T.StructField(name, logical_to_spark(lt), True) for name, lt in columns.items()]
    )


def types_equivalent(actual: T.DataType, logical: str) -> bool:
    """Post-run dtype check: does the actual Spark type satisfy the logical
    declaration?  ``positive integer`` accepts any integral type, matching
    the reference's waived positivity check (app/main.py:318-320).
    """
    target = logical_to_spark(logical)
    if isinstance(target, T.LongType):
        return isinstance(actual, (T.LongType, T.IntegerType, T.ShortType, T.ByteType))
    if isinstance(target, T.DoubleType):
        return isinstance(actual, (T.DoubleType, T.FloatType))
    return actual == target
