"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side contract is real and tested — binary columns with typed
metadata, Arrow-batched ``mapInPandas`` decode/feature stages, schema
and batch shape exactly what a production pipeline needs. The actual
codec step is STUBBED (no image/audio libraries in this container):
``decode_media`` tries the real decoder import and falls back to a
deterministic fake derived from the bytes, clearly marked.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def attach_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in media bytes: the document text encoded as binary, with
    a kind derived from doc_id (image/audio/video round-robin). In a
    real crawl these bytes come from the fetch stage's media spans."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("media"),
    )


def _fake_decode(doc_id: int, kind: str, data: bytes) -> dict:
    """Deterministic stand-in for the codec: features are pure
    arithmetic on byte length (so an SQL oracle can verify plumbing)."""
    n = len(data or b"")
    return dict(
        doc_id=doc_id, kind=kind, n_bytes=n,
        width=(n % 640) + 1, height=((n * 7) % 480) + 1,
        n_frames=(n % 24) + 1 if kind == "video" else 1,
        decoder="stub",
    )


def decode_media(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """media(doc_id, kind, media:binary) → feature rows, one
    mapInPandas pass (Arrow batches ≈ the decoder's working set).

    Real decode would go here (PIL/av/soundfile); the container has no
    codec libraries, so rows fall back to the deterministic stub."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import PIL.Image  # noqa: F401  (not installed here)
            have_codecs = True
        except ImportError:
            have_codecs = False
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if have_codecs and r.kind == "image":
                    # real path: PIL.Image.open(io.BytesIO(r.media)) …
                    raise NotImplementedError("real codec path untested in this container")
                rows.append(_fake_decode(r.doc_id, r.kind, r.media))
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_FEATURES_SCHEMA.fields])

    return media.mapInPandas(gen, schema=MEDIA_FEATURES_SCHEMA)
