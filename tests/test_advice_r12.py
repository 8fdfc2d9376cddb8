"""Regression pins for the round-11 ADVICE findings (fixed in round 12).

1. A single-component JPEG scan is NON-interleaved per ITU-T T.81
   §A.2.2: one 8×8 data unit per MCU in raster order, declared sampling
   factors ignored.  Some transcoders emit grayscale frames declaring
   2×2 sampling; the r11 decoder tiled hs×vs blocks per MCU and
   scrambled those.
2. ``image_features_jpeg_oracle_sql`` counts CHARACTERS while the synth
   encodes UTF-8 BYTES — valid only for ASCII corpora.  The oracle now
   guards that assumption with a DuckDB ``error()`` so a non-ASCII
   corpus fails loudly instead of silently hash-mismatching.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from openetlagent_spark.functions.multimodal import (
    _decode_jpeg,
    encode_gray_jpeg_flat,
    image_features_jpeg_oracle_sql,
)


def _patch_sof_sampling(payload: bytes, hv: int) -> bytes:
    """Rewrite the single component's sampling byte inside SOF0."""
    idx = payload.index(b"\xff\xc0")
    # FF C0 | len(2) | prec(1) | h(2) | w(2) | nc(1) | id(1) | hv(1) ...
    assert payload[idx + 9] == 1, "expected a single-component SOF"
    out = bytearray(payload)
    out[idx + 11] = hv
    return bytes(out)


class TestSingleComponentScanIsNonInterleaved:
    def test_declared_2x2_sampling_is_ignored(self):
        rng = np.random.default_rng(7)
        arr = rng.integers(0, 256, size=(11, 5), dtype=np.uint8)
        base = encode_gray_jpeg_flat(arr)
        ref = _decode_jpeg(base)
        assert ref is not None
        for hv in (0x22, 0x21, 0x12, 0x44):
            patched = _patch_sof_sampling(base, hv)
            got = _decode_jpeg(patched)
            assert got is not None, f"hv={hv:#x} wrongly rejected"
            np.testing.assert_array_equal(got, ref)

    def test_flat_block_values_roundtrip_under_declared_sampling(self):
        # decode(encode(x)) is exact for flat blocks — the declared
        # sampling must not break the round-trip either
        arr = np.arange(12, dtype=np.uint8).reshape(4, 3) * 20
        patched = _patch_sof_sampling(encode_gray_jpeg_flat(arr), 0x22)
        got = _decode_jpeg(patched)
        assert got is not None
        expect = np.kron(arr, np.ones((8, 8), dtype=np.uint8))
        np.testing.assert_array_equal(got, expect)


class TestJpegOracleAsciiGuard:
    def _run(self, texts):
        con = duckdb.connect()
        values = ", ".join(
            f"({i + 1}, '{t}')" for i, t in enumerate(texts)
        )
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"(VALUES {values}) v(doc_id, text)"
        )
        sql = image_features_jpeg_oracle_sql()
        return con.sql(f"SELECT * FROM {sql} ORDER BY media_id").df()

    def test_ascii_corpus_passes(self):
        df = self._run(["hello world", "abc", ""])
        assert len(df) == 3
        assert df["n_pixels"].tolist() == [
            3 * 4 * 64,  # 11 chars -> 3 rows of 4 blocks
            1 * 4 * 64,
            0,
        ]

    def test_non_ascii_corpus_fails_loudly(self):
        with pytest.raises(duckdb.Error, match="ASCII"):
            self._run(["hello", "héllo"])
