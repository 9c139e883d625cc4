"""Multimodal-column plumbing (beyond-reference extension; BASELINE.json
north star: "multimodal columns").

Pattern: media lives as an opaque `binary` column with typed metadata;
decode / feature-extract runs as an Arrow-batched Pandas function over
`mapInPandas`, so each task processes columnar batches and the pipeline
shape (schema, partitioning, batch iteration) is exactly what a real
image/audio decoder would plug into. `decode_media` is CAPABILITY-GATED:
it decodes images for real when PIL is installed (absent in this
container — see `_image_codec`), and raises NotImplementedError for
audio/video (and for images without PIL); the deterministic metadata
path (byte length, md5, fake dimensions derived from length) is fully
implemented and oracle-checked regardless of codec availability.

The binary payload here is the document text's UTF-8 bytes (the testdata
has no real media); at 100 TB the same plan reads parquet `binary`
columns directly and only the lambda body changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources import load_table

EXTRACT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def _image_codec():
    """Capability check: returns PIL's Image module when the optional
    dependency is installed, else None. The engine never requires it —
    the Spark-side plumbing (schema, partitioning, Arrow batch shape)
    runs on the deterministic metadata path either way."""
    try:
        from PIL import Image  # type: ignore[import-not-found]

        return Image
    except ImportError:
        return None


HAS_IMAGE_CODEC = _image_codec() is not None


def decode_media(payload: bytes, media_type: str) -> dict:
    """Decode one media payload to metadata. Images decode for real when
    PIL is installed (capability-gated — absent in this container); audio/
    video codecs (librosa / av) remain honestly stubbed. Swapping in a
    codec changes only this function; extract_features' deterministic
    metadata path is unaffected."""
    if media_type == "image":
        image_mod = _image_codec()
        if image_mod is not None:
            import io

            with image_mod.open(io.BytesIO(payload)) as im:
                im.load()
                return {
                    "width": im.width,
                    "height": im.height,
                    "n_frames": int(getattr(im, "n_frames", 1)),
                }
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present here; "
        "use extract_features' deterministic metadata path instead"
    )


def _make_extract_batches():
    """Build the Arrow-batched extraction function as a CLOSURE so
    cloudpickle serializes it by value — Python workers on executors do
    not have this package on their import path (only the driver does),
    so a module-level function reference would fail to unpickle there."""

    def extract_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes.astype("int64"),
                    "content_md5": payloads.map(
                        lambda b: _hashlib.md5(b).hexdigest()
                    ),
                    # deterministic stand-ins for decoder output (see oracle)
                    "width": (100 + n_bytes % 800).astype("int32"),
                    "height": (100 + (n_bytes * 7) % 600).astype("int32"),
                    "n_frames": (1 + n_bytes % 24).astype("int32"),
                }
            )

    return extract_batches


def multimodal_extract(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Binary-column metadata extraction over mapInPandas (Arrow path).

    The scan projects only (doc_id, text); the payload materializes as a
    binary column; extraction is embarrassingly parallel — no shuffle."""
    docs = load_table(spark, "documents", sf_dir)
    media = docs.select(
        "doc_id",
        F.expr("encode(text, 'UTF-8')").alias("payload"),
        F.expr(
            "case when doc_id % 3 = 0 then 'image'"
            " when doc_id % 3 = 1 then 'audio' else 'video' end"
        ).alias("media_type"),
    )
    return media.mapInPandas(_make_extract_batches(), schema=EXTRACT_SCHEMA)


# --------------------------------------------------- frame sampling

FRAME_SAMPLES = 4  # uniform-stride target: ≤4 sampled frames per video

FRAMESAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)


def _make_framesample_batches():
    """Closure for cloudpickle-by-value (see _make_extract_batches)."""

    def framesample_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            n_bytes = pdf["payload"].map(len).to_numpy()
            content_md5 = pdf["payload"].map(
                lambda b: _hashlib.md5(b).hexdigest()
            )
            n_frames = (1 + n_bytes % 24).astype("int64")
            stride = -(-n_frames // FRAME_SAMPLES)  # ceil
            doc_ids, frames, idxs, md5s = [], [], [], []
            for doc, md, n, s in zip(
                pdf["doc_id"], content_md5, n_frames, stride
            ):
                for i in range(0, int(n), int(s)):
                    doc_ids.append(doc)
                    frames.append(int(n))
                    idxs.append(i)
                    md5s.append(
                        _hashlib.md5(f"{md}-{i}".encode()).hexdigest()
                    )
            yield _pd.DataFrame(
                {
                    "doc_id": _np.asarray(doc_ids, dtype="int64"),
                    "n_frames": _np.asarray(frames, dtype="int32"),
                    "frame_idx": _np.asarray(idxs, dtype="int32"),
                    "frame_md5": md5s,
                }
            )

    return framesample_batches


def multimodal_framesample(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    """Uniform-stride frame sampling over video payloads: one output row
    per sampled frame (≤4 per video), fanned out inside the Arrow batch —
    exactly the shape a real `av`-based sampler produces. The frame
    digest stands in for the decoded frame's content hash."""
    docs = load_table(spark, "documents", sf_dir)
    videos = docs.where(F.expr("doc_id % 3 = 2")).select(
        "doc_id", F.expr("encode(text, 'UTF-8')").alias("payload")
    )
    return videos.mapInPandas(
        _make_framesample_batches(), schema=FRAMESAMPLE_SCHEMA
    )


# --------------------------------------------------------- resize

RESIZE_TARGET = 224

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("new_width", IntegerType()),
        StructField("new_height", IntegerType()),
        StructField("resized_bytes", LongType()),
    ]
)


def _make_resize_batches():
    """Closure for cloudpickle-by-value (see _make_extract_batches)."""

    def resize_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            w = 100 + n_bytes % 800
            h = 100 + (n_bytes * 7) % 600
            m = w.combine(h, max)
            # aspect-preserving fit into 224×224, integer-exact
            new_w = (w * RESIZE_TARGET) // m
            new_h = (h * RESIZE_TARGET) // m
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "new_width": new_w.astype("int32"),
                    "new_height": new_h.astype("int32"),
                    "resized_bytes": (new_w * new_h * 3).astype("int64"),
                }
            )

    return resize_batches


def multimodal_resize(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    """Aspect-preserving resize planning for image payloads (fit into
    224×224): integer-exact target dimensions + decoded-buffer size, via
    the same Arrow mapInPandas seam a real PIL resize would occupy."""
    docs = load_table(spark, "documents", sf_dir)
    images = docs.where(F.expr("doc_id % 3 = 0")).select(
        "doc_id", F.expr("encode(text, 'UTF-8')").alias("payload")
    )
    return images.mapInPandas(_make_resize_batches(), schema=RESIZE_SCHEMA)


# ------------------------------------------------------------- oracle SQL

# The Python path computes md5 over the UTF-8 payload and derives the fake
# dimensions from the byte length — both reproducible in SQL, so even the
# Pandas-UDF plumbing is value-checked, not just schema-checked.
ORACLES: dict[str, str] = {
    "multimodal_extract": """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5,
       CAST(100 + strlen(text) % 800 AS INTEGER) AS width,
       CAST(100 + (strlen(text) * 7) % 600 AS INTEGER) AS height,
       CAST(1 + strlen(text) % 24 AS INTEGER) AS n_frames
FROM documents
""",
    "multimodal_framesample": f"""
WITH v AS (
    SELECT doc_id, md5(text) AS content_md5,
           CAST(1 + strlen(text) % 24 AS INTEGER) AS n_frames
    FROM documents WHERE doc_id % 3 = 2
),
s AS (
    SELECT doc_id, n_frames, content_md5,
           unnest(generate_series(0, n_frames - 1,
               CAST(ceil(n_frames / {FRAME_SAMPLES}.0) AS INTEGER)))
               AS frame_idx
    FROM v
)
SELECT doc_id, n_frames, CAST(frame_idx AS INTEGER) AS frame_idx,
       md5(content_md5 || '-' || CAST(frame_idx AS VARCHAR)) AS frame_md5
FROM s
""",
    "multimodal_resize": f"""
WITH i AS (
    SELECT doc_id,
           CAST(100 + strlen(text) % 800 AS BIGINT) AS w,
           CAST(100 + (strlen(text) * 7) % 600 AS BIGINT) AS h
    FROM documents WHERE doc_id % 3 = 0
)
SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       CAST((w * {RESIZE_TARGET}) // greatest(w, h) AS INTEGER) AS new_width,
       CAST((h * {RESIZE_TARGET}) // greatest(w, h) AS INTEGER) AS new_height,
       CAST(((w * {RESIZE_TARGET}) // greatest(w, h))
            * ((h * {RESIZE_TARGET}) // greatest(w, h)) * 3 AS BIGINT)
           AS resized_bytes
FROM i
""",
}
