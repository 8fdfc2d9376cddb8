"""Large-scale training-data-pipeline functions: text analysis, dedup,
similarity search, multimodal columns.  These extend the reference's
capability surface (BASELINE.json north star) and are designed for the
100 TB path: built-in JVM expressions wherever possible, Arrow-batched
pandas UDFs where not, never driver-side loops."""

from .text import (
    LANG_STOPWORDS,
    with_char_classes,
    with_fingerprint,
    with_lang_id,
    with_quality,
    with_token_counts,
)

__all__ = [
    "LANG_STOPWORDS",
    "with_char_classes",
    "with_fingerprint",
    "with_lang_id",
    "with_quality",
    "with_token_counts",
]
