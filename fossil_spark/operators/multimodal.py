"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side machinery here — schemas, batch iteration, partition
sizing — is real and tested. The actual media decoding is STUBBED
(this container has no image/audio libraries): `decode_image_meta`
derives a deterministic fake header from the bytes' md5 so pipelines
are end-to-end testable; swap `_fake_decode` for PIL/ffmpeg in a real
deployment (same signature, same schema).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

IMAGE_META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("content_md5", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("mode", StringType()),
])


def _fake_decode(data: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for an image decoder. Replace with
    PIL.Image.open in production (NotImplementedError-free stub so the
    distributed plumbing is testable)."""
    h = hashlib.md5(data).hexdigest()
    width = int(h[:2], 16) + 1
    height = int(h[2:4], 16) + 1
    mode = "RGB" if int(h[4], 16) % 2 == 0 else "L"
    return width, height, mode


def decode_image_meta(
    df: DataFrame, binary_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Extract typed metadata from an opaque image binary column.

    mapInPandas: Arrow-batched, one Python worker pass per partition —
    never a per-row UDF. Output schema is fixed (IMAGE_META_SCHEMA) so
    downstream plans stay columnar."""
    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                data = bytes(r[binary_col]) if r[binary_col] is not None else b""
                w, h, mode = _fake_decode(data)
                rows.append(
                    (r[id_col], len(data), hashlib.md5(data).hexdigest(), w, h, mode)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_META_SCHEMA.fields]
            )

    return df.select(id_col, binary_col).mapInPandas(process, IMAGE_META_SCHEMA)


def resize_stub(
    df: DataFrame, max_side: int, binary_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Resize plumbing: computes target dimensions from (fake) decoded
    size; the pixel transform itself is the stubbed step. Shows the
    partition-preserving shape a real resize would use."""
    meta = decode_image_meta(df, binary_col, id_col)
    scale = F.when(
        F.greatest("width", "height") > max_side,
        F.lit(max_side) / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return meta.select(
        id_col,
        "width",
        "height",
        F.floor(F.col("width") * scale).cast("int").alias("target_width"),
        F.floor(F.col("height") * scale).cast("int").alias("target_height"),
    )


def frame_sample_stub(
    df: DataFrame,
    every_n: int,
    binary_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Video frame-sampling plumbing: emits one row per sampled frame
    index (frame count faked from byte length / 1024). A real
    implementation swaps the index computation for ffmpeg probing and
    attaches the frame bytes; the explode shape and partitioning are
    what matter at scale."""
    n_frames = (F.length(binary_col).cast("long") / F.lit(1024)).cast("long") + 1
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
