"""Property tests for the baseline-JPEG codec: random coefficient
blocks, samplings, restart intervals, and flat rasters — generative
coverage beyond test_jpeg's fixed seeds.  Every decode is pinned
against the independent per-block reference iDCT (Aᵀ·F·A + level
shift), so the batched matmul path cannot drift from the per-block
math by even one bit; random byte mutations assert totality (None,
never a raise).  Pure numpy — no Spark session, so the whole file runs
in seconds."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from openetlagent_spark.functions.multimodal import (
    _JPEG_A,
    _decode_jpeg,
    _encode_jpeg_coeffs,
    encode_gray_jpeg_flat,
)

SETTINGS = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _reference_idct(coeffs: np.ndarray) -> np.ndarray:
    pix = _JPEG_A.T @ coeffs.astype(np.float64) @ _JPEG_A
    return np.clip(np.round(pix) + 128, 0, 255).astype(np.uint8)


@given(
    data=st.data(),
    by=st.integers(min_value=1, max_value=4),
    bx=st.integers(min_value=1, max_value=4),
    ri=st.sampled_from([0, 0, 1, 2, 5]),
)
@SETTINGS
def test_random_coefficient_blocks_decode_to_reference_idct(data, by, bx, ri):
    """Arbitrary sparse int coefficients (any zigzag run structure,
    any restart interval) must decode to exactly the reference iDCT of
    each block."""
    seed = data.draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    coeffs = np.zeros((by, bx, 8, 8), dtype=np.int64)
    mask = rng.random((by, bx, 8, 8)) < rng.uniform(0.02, 0.5)
    coeffs[mask] = rng.integers(-500, 500, size=int(mask.sum()))
    img = _decode_jpeg(
        _encode_jpeg_coeffs([coeffs], by * 8, bx * 8, restart_interval=ri)
    )
    assert img is not None and img.shape == (by * 8, bx * 8)
    for y in range(by):
        for x in range(bx):
            assert (
                img[y * 8 : y * 8 + 8, x * 8 : x * 8 + 8]
                == _reference_idct(coeffs[y, x])
            ).all(), (y, x, seed)


@given(
    data=st.data(),
    rows=st.integers(min_value=1, max_value=6),
    cols=st.integers(min_value=1, max_value=6),
)
@SETTINGS
def test_random_flat_rasters_roundtrip_exactly(data, rows, cols):
    seed = data.draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 256, size=(rows, cols), dtype=np.uint8)
    img = _decode_jpeg(encode_gray_jpeg_flat(blocks))
    assert img is not None
    assert (img == np.kron(blocks, np.ones((8, 8), dtype=np.uint8))).all(), seed


@given(
    data=st.data(),
    hs=st.sampled_from([(1, 1), (2, 1), (1, 2), (2, 2)]),
)
@SETTINGS
def test_random_subsampled_scans_return_exact_luma(data, hs):
    """Random luma + chroma coefficients under every common sampling:
    the returned plane must be the luma reference, with chroma blocks
    consumed from the bitstream without corrupting it."""
    seed = data.draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    h, v = hs
    luma = np.zeros((v * 2, h * 2, 8, 8), dtype=np.int64)
    luma[:, :, 0, 0] = rng.integers(-900, 900, size=(v * 2, h * 2))
    luma[0, 0, 1, 1] = int(rng.integers(-100, 100))
    chroma = np.zeros((2, 2, 8, 8), dtype=np.int64)
    chroma[:, :, 0, 0] = rng.integers(-300, 300, size=(2, 2))
    img = _decode_jpeg(
        _encode_jpeg_coeffs(
            [luma, chroma, chroma.copy()],
            v * 16,
            h * 16,
            samplings=[(h, v), (1, 1), (1, 1)],
        )
    )
    assert img is not None and img.shape == (v * 16, h * 16), seed
    for y in range(v * 2):
        for x in range(h * 2):
            assert (
                img[y * 8 : y * 8 + 8, x * 8 : x * 8 + 8]
                == _reference_idct(luma[y, x])
            ).all(), (y, x, seed)


@given(data=st.data())
@SETTINGS
def test_random_mutations_never_raise(data):
    """Flip/truncate random bytes anywhere in a valid payload: decode
    must return an array or None — never raise (the totality contract
    every built-in codec carries)."""
    seed = data.draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 256, size=(3, 3), dtype=np.uint8)
    payload = bytearray(encode_gray_jpeg_flat(blocks))
    n_mut = int(rng.integers(1, 6))
    for _ in range(n_mut):
        pos = int(rng.integers(0, len(payload)))
        payload[pos] = int(rng.integers(0, 256))
    out = _decode_jpeg(bytes(payload))
    assert out is None or isinstance(out, np.ndarray)
    if int(rng.integers(0, 2)):
        cut = int(rng.integers(0, len(payload)))
        out2 = _decode_jpeg(bytes(payload[:cut]))
        assert out2 is None or isinstance(out2, np.ndarray)
