"""Regression pins for the round-12 ADVICE findings (fixed in round 13).

1. ``_jpeg_windows`` kept its 16-bit window table as a Python int list
   (~36 B/bit once object + list-slot overhead is counted, ~300× the
   segment size) for segments of ANY size.  Fine for the synthetic
   harness, but decode_image_builtin is the general real-web JPEG path,
   and a few multi-MB scans inside one mapInPandas batch could OOM an
   executor.  Above ``_JPEG_WIN_LIST_MAX_BITS`` the table now stays an
   int64 numpy array (8 B/entry); the decode loops are
   representation-agnostic, pinned here by forcing the array path onto
   real encoded payloads and asserting bit-identical output.
2. ``apply_ann_store_query`` (and ``_read_ann_store_header``) detected
   PQ stores with ``{'m','k_codes'} & set(meta)`` — a nonempty
   INTERSECTION — so a corrupt/partially-written store carrying exactly
   one of the two keys silently took the PQ serve path and failed deep
   inside ann_pq_from_store.  ``ann_store_is_pq`` now requires the
   superset and raises a named error on a partial pair.
"""

from __future__ import annotations

import numpy as np
import pytest

from openetlagent_spark.functions import multimodal as mm
from openetlagent_spark.functions.similarity import ann_store_is_pq


class TestJpegWindowsRepresentation:
    def test_large_segment_stays_numpy(self):
        data = bytes(range(256)) * 2048  # 512 KiB > 250 KB threshold
        win, n = mm._jpeg_windows(data)
        assert isinstance(win, np.ndarray)
        assert win.dtype == np.int64
        assert n == len(data) * 8
        assert len(win) == n + 1

    def test_small_segment_stays_list(self):
        win, n = mm._jpeg_windows(b"\xab\xcd" * 300)
        assert isinstance(win, list)

    def test_representations_agree_bit_for_bit(self):
        data = bytes((i * 37 + 11) % 256 for i in range(4096))
        as_list, n1 = mm._jpeg_windows(data)
        assert isinstance(as_list, list)
        old = mm._JPEG_WIN_LIST_MAX_BITS
        mm._JPEG_WIN_LIST_MAX_BITS = 2048
        try:
            as_arr, n2 = mm._jpeg_windows(data)
        finally:
            mm._JPEG_WIN_LIST_MAX_BITS = old
        assert isinstance(as_arr, np.ndarray)
        assert n1 == n2
        assert as_arr.tolist() == as_list

    @pytest.mark.parametrize("progressive", [False, True])
    def test_decode_identical_under_forced_array_path(self, progressive):
        # Dense random AC over a 6x6 block grid yields multi-KB entropy
        # segments (> the 2048-bit big-int fast path), so dropping the
        # threshold to its floor forces every vectorized window build
        # onto the numpy-array representation.
        rng = np.random.default_rng(13)
        coeffs = rng.integers(-90, 91, size=(6, 6, 8, 8)).astype(np.int32)
        if progressive:
            payload = mm.encode_jpeg_progressive([coeffs], 48, 48)
            decode = mm._decode_jpeg_progressive
        else:
            payload = mm._encode_jpeg_coeffs([coeffs], 48, 48)
            decode = mm._decode_jpeg
        assert len(payload) > 1024
        ref = decode(payload)
        assert ref is not None
        old = mm._JPEG_WIN_LIST_MAX_BITS
        mm._JPEG_WIN_LIST_MAX_BITS = 2048
        try:
            got = decode(payload)
        finally:
            mm._JPEG_WIN_LIST_MAX_BITS = old
        assert got is not None
        np.testing.assert_array_equal(got, ref)


class TestAnnStorePqDetection:
    def test_both_keys_is_pq(self):
        assert ann_store_is_pq(
            {"scale_bits": 12, "n_centroids": 4, "m": 8, "k_codes": 256},
            "/tmp/s",
        )

    def test_neither_key_is_ivf(self):
        assert not ann_store_is_pq(
            {"scale_bits": 12, "n_centroids": 4}, "/tmp/s"
        )

    @pytest.mark.parametrize("present", ["m", "k_codes"])
    def test_partial_pair_raises_named_error(self, present):
        meta = {"scale_bits": 12, "n_centroids": 4, present: 8}
        with pytest.raises(ValueError, match="corrupt or partially written"):
            ann_store_is_pq(meta, "/tmp/broken_store")
