"""Multimodal column plumbing: image/audio/video as opaque binary.

Binary columns with typed metadata, Arrow-batched ``mapInPandas``
decode / feature / resize stages — the schema, partitioning, and batch
shape a production pipeline needs. The decode step is REAL for the
formats the stdlib can parse (``functions/media``): PNG gets a full
pixel decode (zlib inflate + unfilter), JPEG/GIF/BMP/WAV get header
decodes (dimensions, frame counts, sample rates). PIL is used as an
import-gated fallback for anything else when it exists in the
environment; bytes no decoder recognizes fall back to a deterministic
stub derived from the byte length, clearly labeled in the ``decoder``
column — so a pipeline can always tell real features from fakes.
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

_KIND_OF_FMT = {
    "png": "image", "jpeg": "image", "gif": "image", "bmp": "image",
    "wav": "audio", "avi": "video", "mp4": "video",
}


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


def synthesize_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """REAL media bytes, deterministically synthesized per document:
    image rows become valid PNGs (stdlib zlib encode), audio rows valid
    WAVs, video rows valid multi-frame GIF89a (minimal-LZW). Dimensions
    and frame counts are pure arithmetic on (doc_id, text length), so a
    SQL oracle can verify the DECODED output of these genuine container
    bytes end to end — the correctness gate for the stdlib decoders in
    functions/media."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from silkworm_spark.functions import media as M

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                d = int(r.doc_id)
                kind = ("image", "audio", "video")[d % 3]
                text = (getattr(r, text_col) or "").encode("utf-8")
                if kind == "image":
                    w, h = d % 31 + 2, (d * 7) % 23 + 2
                    px = ((np.arange(h * w * 3) + d) % 256).astype(
                        np.uint8).reshape(h, w, 3)
                    data = M.png_encode(px)
                elif kind == "audio":
                    n = len(text) % 400 + 20
                    samples = ((np.arange(n) * 31 + d) % 65536 - 32768).astype(
                        np.int16)
                    data = M.wav_encode(samples, sample_rate=8000)
                else:
                    # always ≥2 frames: a 1-frame GIF decodes as a
                    # still image, which would flip the row's kind
                    w, h, nf = d % 15 + 2, (d * 3) % 11 + 2, d % 5 + 2
                    frames = [
                        ((np.arange(h * w) + d + f) % 256).astype(
                            np.uint8).reshape(h, w)
                        for f in range(nf)
                    ]
                    data = M.gif_encode(frames, w, h)
                rows.append(dict(doc_id=d, kind=kind, media=data))
            yield pd.DataFrame(rows, columns=["doc_id", "kind", "media"])

    return docs.select("doc_id", F.col(text_col)).mapInPandas(
        gen, schema="doc_id long, kind string, media binary"
    )


def _fake_decode(doc_id: int, kind: str, data: bytes) -> dict:
    """Deterministic stand-in for unrecognized bytes: features are pure
    arithmetic on byte length (so an SQL oracle can verify plumbing)."""
    n = len(data or b"")
    return dict(
        doc_id=doc_id, kind=kind, n_bytes=n,
        width=(n % 640) + 1, height=((n * 7) % 480) + 1,
        n_frames=(n % 24) + 1 if kind == "video" else 1,
        decoder="stub",
    )


def _real_decode(doc_id: int, data: bytes) -> dict | None:
    """Stdlib decode of recognized containers; None → caller falls
    back (PIL if present, else the labeled stub)."""
    from silkworm_spark.functions import media as M

    fmt = M.sniff_media(data)
    if fmt is None:
        return None
    base = dict(doc_id=doc_id, kind=_KIND_OF_FMT[fmt], n_bytes=len(data),
                width=None, height=None, n_frames=None,
                decoder=f"stdlib-{fmt}")
    try:
        if fmt == "png":
            i = M.png_info(data)
            base.update(width=i["width"], height=i["height"], n_frames=1)
        elif fmt == "jpeg":
            i = M.jpeg_info(data)
            base.update(width=i["width"], height=i["height"], n_frames=1)
        elif fmt == "gif":
            i = M.gif_info(data)
            base.update(width=i["width"], height=i["height"],
                        n_frames=i["n_frames"],
                        # an animated GIF is a video for pipeline
                        # routing purposes; a single frame is an image
                        kind="video" if i["n_frames"] > 1 else "image")
        elif fmt == "bmp":
            i = M.bmp_info(data)
            base.update(width=i["width"], height=i["height"], n_frames=1)
        elif fmt == "wav":
            i = M.wav_info(data)
            base.update(width=i["channels"], height=i["sample_rate"],
                        n_frames=i["n_frames"])
        else:  # avi/mp4: container recognized, no stdlib index parse
            return None
    except Exception:
        return None
    return base


def decode_media(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """media(doc_id, kind, media:binary) → feature rows, one
    mapInPandas pass (Arrow batches ≈ the decoder's working set).

    Decoder precedence per row: stdlib container parse (REAL — see
    functions/media) → PIL when importable (gated, absent in this
    container) → deterministic stub labeled ``decoder='stub'``."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import PIL.Image  # noqa: F401  (absent in this container)
            have_pil = True
        except ImportError:
            have_pil = False
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                data = bytes(r.media or b"")
                out = _real_decode(r.doc_id, data)
                if out is None and have_pil:
                    import io

                    try:
                        with PIL.Image.open(io.BytesIO(data)) as im:
                            out = dict(
                                doc_id=r.doc_id, kind="image",
                                n_bytes=len(data), width=im.width,
                                height=im.height,
                                n_frames=getattr(im, "n_frames", 1),
                                decoder="pil",
                            )
                    except Exception:
                        out = None
                rows.append(out or _fake_decode(r.doc_id, r.kind, data))
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_FEATURES_SCHEMA.fields])

    return media.mapInPandas(gen, schema=MEDIA_FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Real image resize for decodable PNGs: pixel decode →
    nearest-neighbor resample → re-encode, all stdlib+numpy, one
    mapInPandas pass. Rows whose bytes aren't a decodable PNG pass
    through untouched with ok=false (a production pipeline routes them
    to a PIL/ffmpeg stage instead)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from silkworm_spark.functions import media as M

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                data = bytes(r.media or b"")
                try:
                    px = M.resize_nearest(M.png_decode(data), width, height)
                    rows.append(dict(doc_id=r.doc_id, media=M.png_encode(px),
                                     width=width, height=height, ok=True))
                except Exception:
                    rows.append(dict(doc_id=r.doc_id, media=data,
                                     width=None, height=None, ok=False))
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return media.mapInPandas(gen, schema=RESIZED_SCHEMA)


def frame_sample(features: DataFrame, k: int = 4) -> DataFrame:
    """Uniform temporal frame sample over decoded video features:
    (doc_id, frame_index) with floor(i*n_frames/k) for i<min(k,n) —
    pure column arithmetic (JVM-side, SQL-oracle-recomputable), the
    exact indices ``functions/media.sample_frames`` yields."""
    n = F.col("n_frames")
    idx = F.sequence(F.lit(0), F.least(F.lit(k), n) - 1)
    return (
        features.filter((F.col("kind") == "video") & (n > 0))
        .select(
            "doc_id",
            F.explode(
                F.transform(idx, lambda i: F.floor(i * n / F.least(F.lit(k), n)))
            ).alias("frame_index"),
        )
        .select("doc_id", F.col("frame_index").cast("int").alias("frame_index"))
    )
