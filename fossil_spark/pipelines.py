"""End-to-end training-data pipelines composed from the operator
library — the shapes a corpus-curation job actually runs, expressed
as one declarative plan so Catalyst fuses the stages (single scan of
the corpus feeding quality + language scoring, dedup keep-set
semi-join, then chunking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fossil_spark.operators import dedup, text


def curate_corpus(
    df: DataFrame,
    min_quality: float = 0.45,
    lang: str = "en",
    chunk_tokens: int = 64,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-filter -> language-filter -> exact-dedup -> chunk.

    Returns training-ready chunks with provenance (per-document
    quality and predicted language carried through). Every stage is a
    Column expression or equi-join: one corpus scan fans into the
    scoring joins, the dedup keep-set is a semi-join on the kept ids
    (never a self cross product), and chunking is a higher-order
    slice/explode. 100 TB shape: 2 shuffles (dedup groupBy + the
    scoring join), both partial-aggregated map-side."""
    quality = text.quality_score(df, text_col=text_col).select(
        id_col, "quality"
    )
    langs = text.lang_id(df, text_col=text_col).select(id_col, "pred_lang")
    keep = dedup.exact_dedup(df, text_col=text_col, id_col=id_col).select(
        F.col("keep_id").alias(id_col)
    )
    kept = (
        df.join(keep, id_col, "left_semi")
        .join(quality, id_col)
        .join(langs, id_col)
        .filter((F.col("quality") >= min_quality) & (F.col("pred_lang") == lang))
    )
    chunks = text.chunk_text(
        kept, chunk_tokens=chunk_tokens, overlap=overlap, text_col=text_col,
        id_col=id_col,
    )
    meta = kept.select(id_col, "quality", "pred_lang")
    return chunks.join(meta, id_col).select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "chunk",
        F.col("chunk_n_tokens").cast("long").alias("chunk_n_tokens"),
        F.round("quality", 6).alias("quality"),
        "pred_lang",
    )
