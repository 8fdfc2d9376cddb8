"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the DECODE step comes in
two flavors (clearly marked):
- ``decoder="fake"`` (default): a deterministic pure-numpy stand-in —
  byte histograms / byte statistics — so the full Spark plumbing
  (schema, batching, partitioning, UDF signatures) is real and testable.
- ``decoder="real"``: uses Pillow when importable (image decode →
  grayscale-histogram feature / true resize + PNG re-encode), else
  raises NotImplementedError naming the missing dependency.  The real
  path is exercised by ``pytest.importorskip("PIL")`` tests
  (tests/test_multimodal_streaming.py) the day codecs exist in the
  environment; frame sampling would additionally need PyAV/ffmpeg and
  stays a named stub.

Everything else — the media struct schema, batch iteration, partition
sizing, feature schemas — is the production shape: at 100 TB these run
as embarrassingly parallel mapInPandas stages over binary columns, with
``spark.sql.files.maxPartitionBytes`` controlling scan granularity and
no shuffle anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Literal

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata accompanying an opaque payload.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def _require_pil():
    """Import Pillow or raise the contract NotImplementedError naming
    the dependency — the single gate for every ``decoder='real'`` path."""
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError as exc:
        raise NotImplementedError(
            "decoder='real' requires Pillow (PIL), not present in this "
            "container; use decoder='fake' for the deterministic stub."
        ) from exc
    return Image


def _real_decode_features(Image, payload: bytes, dim: int) -> np.ndarray:
    """REAL decode: image bytes → grayscale intensity histogram,
    L1-normalized — deterministic given the payload.  TOTAL like the
    fake decoder: corrupt/truncated/non-image payloads yield the zero
    vector instead of failing the task (at 100 TB one bad crawl byte
    must never abort the job; filter feature == zeros downstream)."""
    import io

    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    try:
        img = Image.open(io.BytesIO(payload)).convert("L")
        arr = np.asarray(img, dtype=np.uint8).ravel()
    except Exception:
        return np.zeros(dim, dtype=np.float32)
    hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
    return (hist / max(arr.size, 1)).astype(np.float32)


def _fake_decode_features(payload: bytes, dim: int = 16) -> np.ndarray:
    """STUB decode: deterministic byte-histogram 'feature' — stands in
    for a real decode+embed (see module docstring)."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
    return (hist / max(len(arr), 1)).astype(np.float32)


def extract_image_features(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "media_id",
    mime_col: str = "mime",
    dim: int = 16,
    decoder: Literal["fake", "real"] = "fake",
) -> DataFrame:
    """Binary payload → fixed-dim feature vector, one mapInPandas stage.

    Batches stream through Arrow; nothing is collected.  The 'real'
    decoder (Pillow grayscale histogram — the import is checked on the
    DRIVER so missing codecs fail fast, then re-imported per executor
    batch) shares every line of Spark plumbing with the fake one."""
    if decoder == "real":
        _require_pil()  # fail fast on the driver if Pillow is absent

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder == "real":
            Image = _require_pil()
            decode = lambda b: _real_decode_features(Image, b, dim).tolist()  # noqa: E731
        else:
            decode = lambda b: _fake_decode_features(b, dim).tolist()  # noqa: E731
        for pdf in it:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "mime": pdf[mime_col],
                    "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)).astype("int64"),
                    "feature": payloads.map(decode),
                }
            )

    return df.mapInPandas(batches, IMAGE_FEATURE_SCHEMA)


def resize_images(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    target_width: int = 64,
    target_height: int = 64,
    decoder: Literal["fake", "real"] = "fake",
) -> DataFrame:
    """Resize stage: passes metadata through and rewrites width/height.
    fake: truncate/pad bytes deterministically to w*h (stands in for
    decode→resize→re-encode); real: Pillow decode → nearest-neighbour
    resize (deterministic) → PNG re-encode."""
    if decoder == "real":
        _require_pil()  # fail fast on the driver if Pillow is absent

    out_schema = df.schema

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = target_width * target_height
        if decoder == "real":
            import io

            Image = _require_pil()

            def transform(b: bytes | None) -> bytes:
                # total: undecodable payloads pass through as empty
                # bytes instead of failing the task (see
                # _real_decode_features rationale)
                if not b:
                    return b""
                try:
                    img = Image.open(io.BytesIO(b)).resize(
                        (target_width, target_height), Image.NEAREST
                    )
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    return buf.getvalue()
                except Exception:
                    return b""

        else:

            def transform(b: bytes | None) -> bytes:
                return (b or b"")[:n].ljust(n, b"\0")

        for pdf in it:
            pdf = pdf.copy()
            pdf[payload_col] = pdf[payload_col].map(transform)
            if "width" in pdf.columns:
                pdf["width"] = np.int32(target_width)
            if "height" in pdf.columns:
                pdf["height"] = np.int32(target_height)
            yield pdf

    return df.mapInPandas(batches, out_schema)


def sample_frames(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_frames: int = 4,
    decoder: Literal["fake", "real"] = "fake",
) -> DataFrame:
    """Video → frame rows (one output row per sampled frame): the
    row-expanding mapInPandas shape.  Fake decode slices the payload into
    n equal chunks as stand-in frames."""
    if decoder == "real":
        raise NotImplementedError("Real frame sampling requires PyAV/ffmpeg.")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_idx, out_payload = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = payload or b""
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    out_ids.append(mid)
                    out_idx.append(i)
                    out_payload.append(payload[i * step : (i + 1) * step])
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_index": out_idx, "frame_payload": out_payload}
            )

    return df.mapInPandas(batches, FRAME_SAMPLE_SCHEMA)


def synthesize_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a deterministic media table from any text table (test/demo
    helper): payload = utf-8 bytes, mime by id modulo.  Lets the media
    pipeline run against the driver's documents table."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.when(F.col(id_col) % 2 == 0, F.lit("image/png"))
        .otherwise(F.lit("audio/wav"))
        .alias("mime"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
        (F.length(F.col(text_col)) * 10).cast("long").alias("duration_ms"),
    )


def image_features_oracle_sql(
    doc_pred: str = "TRUE", dim: int = 16, table: str = "documents"
) -> str:
    """DuckDB mirror of synthesize_media → extract_image_features
    (decoder='fake') as a parenthesized subquery yielding
    (media_id, mime, n_bytes, feature REAL[]).

    Valid for ASCII corpora (the driver's test tables are — verified),
    where the utf-8 byte stream equals the per-char code points, so
    the fake decoder's byte histogram is a per-char conditional count:
    bin b = |{ch : ascii(ch) // (256/dim) = b}| / len, rounded to
    float32 exactly as numpy's astype.  The Spark side stays byte-true
    for any input; this oracle mirrors it on the data it is checked
    against."""
    width = 256 // dim
    bins = ", ".join(
        f"SUM(CASE WHEN ascii(ch) // {width} = {b} THEN 1 ELSE 0 END) AS c{b}"
        for b in range(dim)
    )
    feature = "[" + ", ".join(
        f"CASE WHEN d.len > 0 THEN CAST(CAST(COALESCE(c.c{b}, 0) AS DOUBLE) "
        f"/ CAST(d.len AS DOUBLE) AS REAL) ELSE CAST(0.0 AS REAL) END"
        for b in range(dim)
    ) + "]"
    return (
        f"(WITH d AS (SELECT CAST(doc_id AS BIGINT) AS media_id, "
        f"CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS mime, "
        f"COALESCE(length(text), 0) AS len, text FROM {table} WHERE {doc_pred}), "
        f"chars AS (SELECT media_id, unnest(string_split_regex(text, '')) AS ch "
        f"FROM d WHERE len > 0), "
        f"cnt AS (SELECT media_id, {bins} FROM chars GROUP BY media_id) "
        f"SELECT d.media_id, d.mime, CAST(d.len AS BIGINT) AS n_bytes, "
        f"{feature} AS feature FROM d LEFT JOIN cnt c USING (media_id))"
    )
