"""Property-based tests (hypothesis) for the semantics fine print —
small row counts, wide value space, one shared Spark session."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from openetlagent_spark.model import (
    ArithmeticOperation,
    ConcatenationOperation,
    FoldOperation,
    UnfoldOperation,
)
from openetlagent_spark.operators import (
    apply_arithmetic,
    apply_concatenation,
    apply_fold,
    apply_unfold,
)

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts = st.one_of(st.none(), st.text(alphabet="ab c-1", max_size=8))


@given(data=st.lists(st.tuples(texts, texts), min_size=1, max_size=6))
@SETTINGS
def test_concat_null_propagation_property(spark, data):
    df = spark.createDataFrame(
        [Row(i=i, a=a, b=b) for i, (a, b) in enumerate(data)],
        "i int, a string, b string",
    )
    op = ConcatenationOperation(input_columns=["a", "b"], separator="|", output_column="c")
    got = {r.i: r.c for r in apply_concatenation(df, op).collect()}
    for i, (a, b) in enumerate(data):
        expected = None if (a is None or b is None) else f"{a}|{b}"
        assert got[i] == expected


finite_doubles = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
)


@given(
    pairs=st.lists(st.tuples(finite_doubles, finite_doubles), min_size=1, max_size=6),
    op_sym=st.sampled_from(["+", "-", "*", "/"]),
)
@SETTINGS
def test_arithmetic_matches_python_ieee(spark, pairs, op_sym):
    df = spark.createDataFrame(
        [Row(i=i, a=a, b=b) for i, (a, b) in enumerate(pairs)],
        "i int, a double, b double",
    )
    out = apply_arithmetic(
        df, ArithmeticOperation(input_columns=["a", "b"], operator=op_sym, output_column="r")
    )
    got = {r.i: r.r for r in out.collect()}
    import operator as pyop

    fns = {"+": pyop.add, "-": pyop.sub, "*": pyop.mul, "/": pyop.truediv}
    for i, (a, b) in enumerate(pairs):
        if op_sym == "/" and b == 0.0:
            # IEEE parity with Polars: x/0 = ±inf with the SIGN OF THE
            # ZERO included (1.0/-0.0 = -inf), 0/0 = NaN.
            if a == 0.0:
                assert math.isnan(got[i])
            else:
                sign = math.copysign(1.0, a) * math.copysign(1.0, b)
                assert got[i] == sign * math.inf
            continue
        expected = fns[op_sym](a, b)
        assert got[i] == expected or (math.isnan(expected) and math.isnan(got[i]))


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), finite_doubles, finite_doubles), min_size=1, max_size=8
    )
)
@SETTINGS
def test_fold_unfold_roundtrip_property(spark, rows):
    # Unique ids per row; fold x,y to long form then pivot back.
    df = spark.createDataFrame(
        [Row(id=i, x=x, y=y) for i, (_, x, y) in enumerate(rows)],
        "id int, x double, y double",
    )
    folded = apply_fold(
        df,
        FoldOperation(
            id_columns=["id"], value_columns=["x", "y"], key_column_name="k", value_column_name="v"
        ),
    )
    assert folded.count() == 2 * len(rows)
    unfolded = apply_unfold(
        folded, UnfoldOperation(index_columns=["id"], key_column="k", value_column="v")
    )
    got = {r.id: (r.x, r.y) for r in unfolded.collect()}
    for i, (_, x, y) in enumerate(rows):
        assert got[i] == (x, y)
