"""Progressive JPEG (SOF2) decoder + encoder — r11 VERDICT task 4.

The contract under test: ``decode(encode_jpeg_progressive(C)) ==
decode(_encode_jpeg_coeffs(C))`` pixel-for-pixel for ANY quantized
coefficient content, sampling layout, scan script (spectral selection
bands × successive-approximation depths), and restart interval — i.e.
the progressive path is semantics-preserving re-encoding, never a
different image.  Totality mirrors the baseline codec: hostile bytes
→ None, never a raised error.
"""

from __future__ import annotations

import numpy as np
import pytest

from openetlagent_spark.functions.multimodal import (
    _decode_jpeg,
    _decode_jpeg_progressive,
    _encode_jpeg_coeffs,
    decode_image_builtin,
    encode_gray_jpeg_flat,
    encode_gray_jpeg_prog_flat,
    encode_jpeg_progressive,
)


def _random_comps(rng, h, w, samps, density=0.2, amp=40):
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))
    comps = []
    for hs, vs in samps:
        c = rng.integers(-amp, amp + 1, size=(mcy * vs, mcx * hs, 8, 8))
        mask = rng.random(c.shape) < density
        comps.append((c * mask).astype(np.int64))
    return comps


SCAN_SCRIPTS = [
    # (al_dc, al_ac, ac_bands, restart_interval)
    (0, 0, ((1, 63),), 0),  # spectral selection only
    (1, 1, ((1, 5), (6, 63)), 0),  # one refinement level
    (2, 2, ((1, 2), (3, 20), (21, 63)), 4),  # deep refinement + restarts
    (1, 2, ((1, 63),), 7),  # asymmetric DC/AC depths
]

SAMPLINGS = [
    [(1, 1)],  # grayscale
    [(1, 1), (1, 1), (1, 1)],  # 4:4:4 color
    [(2, 2), (1, 1), (1, 1)],  # 4:2:0 (padded luma rows AND cols)
    [(2, 1), (1, 1), (1, 1)],  # 4:2:2
    [(1, 2), (1, 1), (1, 1)],  # vertical-only subsample
]


class TestProgressiveMatchesBaseline:
    @pytest.mark.parametrize("samps", SAMPLINGS, ids=lambda s: f"{len(s)}c{s[0]}")
    def test_random_coefficients_all_scan_scripts(self, samps):
        rng = np.random.default_rng(hash(str(samps)) % 2**31)
        for trial in range(4):
            h = int(rng.integers(9, 70))
            w = int(rng.integers(9, 70))
            comps = _random_comps(rng, h, w, samps)
            ref = _decode_jpeg(_encode_jpeg_coeffs(comps, h, w, samplings=samps))
            assert ref is not None
            for al_dc, al_ac, bands, ri in SCAN_SCRIPTS:
                prog = encode_jpeg_progressive(
                    comps, h, w, samplings=samps, al_dc=al_dc, al_ac=al_ac,
                    ac_bands=bands, restart_interval=ri,
                )
                got = decode_image_builtin(prog)
                assert got is not None, (trial, h, w, al_dc, al_ac, bands, ri)
                np.testing.assert_array_equal(got, ref)

    def test_dense_coefficients_exercise_zrl_and_corrections(self):
        # density 0.75 at high amplitude drives long correction-bit
        # runs, ZRL-with-buffered-bits, and multi-level refinements
        rng = np.random.default_rng(3)
        comps = _random_comps(rng, 40, 40, [(1, 1)], density=0.75, amp=500)
        ref = _decode_jpeg(_encode_jpeg_coeffs(comps, 40, 40))
        prog = encode_jpeg_progressive(
            comps, 40, 40, al_dc=3, al_ac=3, ac_bands=((1, 63),)
        )
        np.testing.assert_array_equal(decode_image_builtin(prog), ref)

    def test_sparse_blocks_exercise_long_eob_runs(self):
        # mostly-empty bands accumulate EOBRUN > 255 (multi-bit EOBn)
        rng = np.random.default_rng(4)
        comps = _random_comps(rng, 320, 64, [(1, 1)], density=0.001)
        ref = _decode_jpeg(_encode_jpeg_coeffs(comps, 320, 64))
        prog = encode_jpeg_progressive(comps, 320, 64, al_dc=1, al_ac=1)
        np.testing.assert_array_equal(decode_image_builtin(prog), ref)

    def test_flat_block_helper_matches_baseline_helper(self):
        rng = np.random.default_rng(5)
        arr = rng.integers(0, 256, size=(23, 4), dtype=np.uint8)
        ref = _decode_jpeg(encode_gray_jpeg_flat(arr))
        got = decode_image_builtin(encode_gray_jpeg_prog_flat(arr))
        assert got is not None
        np.testing.assert_array_equal(got, ref)
        expect = np.kron(arr, np.ones((8, 8), dtype=np.uint8))
        np.testing.assert_array_equal(got, expect)

    def test_empty_input_helper(self):
        assert encode_gray_jpeg_prog_flat(np.zeros((0, 4), dtype=np.uint8)) == b""


class TestProgressiveTotality:
    def test_truncations_never_raise(self):
        rng = np.random.default_rng(6)
        comps = _random_comps(rng, 24, 24, [(1, 1)])
        prog = encode_jpeg_progressive(comps, 24, 24, al_dc=1, al_ac=1)
        full = decode_image_builtin(prog)
        assert full is not None
        for cut in range(0, len(prog), 7):
            r = decode_image_builtin(prog[:cut])  # must not raise
            assert r is None or isinstance(r, np.ndarray)

    def test_byte_corruption_never_raises(self):
        rng = np.random.default_rng(7)
        comps = _random_comps(rng, 24, 24, [(1, 1)])
        prog = bytearray(
            encode_jpeg_progressive(comps, 24, 24, al_dc=1, al_ac=1)
        )
        for _ in range(200):
            i = int(rng.integers(2, len(prog)))
            b = bytes(prog[:i]) + bytes([int(rng.integers(0, 256))]) + bytes(prog[i + 1:])
            r = decode_image_builtin(b)  # must not raise
            assert r is None or isinstance(r, np.ndarray)

    def test_non_sof2_frames_rejected_by_progressive_decoder(self):
        rng = np.random.default_rng(8)
        arr = rng.integers(0, 256, size=(4, 4), dtype=np.uint8)
        baseline = encode_gray_jpeg_flat(arr)
        assert _decode_jpeg_progressive(baseline) is None  # SOF0 inside

    def test_no_scans_is_none(self):
        rng = np.random.default_rng(9)
        comps = _random_comps(rng, 16, 16, [(1, 1)])
        prog = encode_jpeg_progressive(comps, 16, 16)
        # cut just after the SOF2 segment: headers only, zero scans
        sos = prog.index(b"\xff\xda")
        assert decode_image_builtin(prog[:sos] + b"\xff\xd9") is None
