"""Multimodal-column plumbing (beyond-reference extension; BASELINE.json
north star: "multimodal columns").

Pattern: media lives as an opaque `binary` column with typed metadata;
decode / feature-extract runs as an Arrow-batched Pandas function over
`mapInPandas`, so each task processes columnar batches and the pipeline
shape (schema, partitioning, batch iteration) is exactly what a real
image/audio decoder would plug into. The actual codec is STUBBED — this
container has no image/audio libraries — behind `decode_media`, which
raises NotImplementedError for real decoding while the deterministic
metadata path (byte length, md5, fake dimensions derived from length) is
fully implemented and oracle-checked.

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


def decode_media(payload: bytes, media_type: str) -> dict:
    """STUB: real decode (PIL / librosa / av) is unavailable in this
    environment. The deterministic metadata below stands in for the
    decoder output; swapping in a real codec changes only this function.
    """
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
}
