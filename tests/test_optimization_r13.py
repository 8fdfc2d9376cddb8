"""Round-13 optimization pins: the numpy Lloyd fast path must stay
bit-identical to the pure-Python reference loop, and the concurrent
store-layer writer must propagate failures."""

from __future__ import annotations

import random

import pytest

from openetlagent_spark.functions.similarity import _lloyd, _lloyd_reference
from openetlagent_spark.session import run_concurrent_writes


def _random_grid(n: int, dim: int, lo: int, hi: int, seed: int) -> list[list[int]]:
    rng = random.Random(seed)
    return [[rng.randint(lo, hi) for _ in range(dim)] for _ in range(n)]


@pytest.mark.parametrize(
    "n,dim,k,iters,lo,hi,seed",
    [
        (64, 8, 4, 2, -(1 << 20), 1 << 20, 1),  # the _quantize grid range
        (200, 16, 16, 3, -(1 << 20), 1 << 20, 2),
        (50, 4, 7, 2, 0, 3, 3),  # tiny value range: forces distance TIES
        (33, 5, 33, 2, -5, 5, 4),  # k == n: every row its own init centroid
        (40, 6, 8, 1, -(1 << 40), 1 << 40, 5),  # large grid, still < 2^52
    ],
)
def test_lloyd_numpy_matches_reference(n, dim, k, iters, lo, hi, seed):
    sample = _random_grid(n, dim, lo, hi, seed)
    cents_fast, rats_fast = _lloyd(sample, k, iters)
    cents_ref, rats_ref = _lloyd_reference(sample, k, iters)
    # bit-identical floats (== on float is exact equality) and the
    # exact integer rationals the oracle generators embed
    assert cents_fast == cents_ref
    assert rats_fast == rats_ref


def test_lloyd_duplicate_rows_tie_to_lower_cid():
    # identical rows make every centroid distance equal: the reference
    # strict-< scan keeps the LOWER cid, argmin must do the same
    sample = [[7, 7]] * 10 + [[1, 2], [3, 4]]
    cents_fast, rats_fast = _lloyd(sample, 3, 2)
    cents_ref, rats_ref = _lloyd_reference(sample, 3, 2)
    assert cents_fast == cents_ref
    assert rats_fast == rats_ref


def test_lloyd_out_of_grid_falls_back_to_reference():
    # coordinates beyond int64 → the numpy path must defer, not wrap
    big = 1 << 70
    sample = [[big, 0], [0, big], [big, big], [1, 1]]
    cents_fast, rats_fast = _lloyd(sample, 2, 2)
    cents_ref, rats_ref = _lloyd_reference(sample, 2, 2)
    assert cents_fast == cents_ref
    assert rats_fast == rats_ref


def test_lloyd_k_exceeds_sample_raises():
    with pytest.raises(ValueError, match="exceeds"):
        _lloyd([[1, 2]], 3, 1)


def test_run_concurrent_writes_propagates_first_error():
    calls = []

    def ok():
        calls.append("ok")

    def boom():
        raise RuntimeError("layer write failed")

    with pytest.raises(RuntimeError, match="layer write failed"):
        run_concurrent_writes([ok, boom, ok])
    # every thunk ran (all awaited before re-raise)
    assert calls == ["ok", "ok"]


def test_run_concurrent_writes_single_thunk_inline():
    out = []
    run_concurrent_writes([lambda: out.append(1)])
    assert out == [1]
