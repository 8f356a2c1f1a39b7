"""Document chunking for training-window preparation.

No reference ancestor — training-data extension: pretraining loaders
consume fixed-size token windows, so the last pipeline step before
shard export splits each document into ``max_tokens``-token chunks
with ``overlap`` tokens of context carried between consecutive chunks
(the standard sliding-window packing prep).

Pure Catalyst: tokenize once, build the chunk-start sequence
(step = max_tokens - overlap), slice per start, posexplode — one scan,
one explode, no UDF, no shuffle (chunking is embarrassingly
row-local; the output inherits the input's partitioning).

Whitespace caveat (documented, not hidden): chunk text is the tokens
re-joined with single spaces, so runs of whitespace collapse. Chunk
on normalized text (the pipeline's scrubbed output) where that
matters; token-exact reconstruction would need offset tracking that
no tokenizer-bound consumer asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_quality_checker_spark.functions.text import tokens

__all__ = ["chunk_documents"]


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    overlap: int = 0,
    min_chunk_tokens: int = 1,
    lowercase: bool = False,
) -> DataFrame:
    """One row per chunk: ``(id_col, chunk_id, chunk_text, n_tokens)``
    where ``chunk_id`` counts from 0 in document order and consecutive
    chunks share ``overlap`` tokens. Documents with NULL text or fewer
    than ``min_chunk_tokens`` tokens produce no rows; a final short
    chunk is kept when it has >= ``min_chunk_tokens`` tokens BEYOND
    the overlap (otherwise its tokens are already fully contained in
    the previous chunk)."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    step = max_tokens - overlap
    tk = tokens(F.col(text_col), lowercase=lowercase)
    base = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), tk.alias("_tk"))
        .filter(F.size("_tk") >= min_chunk_tokens)
    )
    # starts: 0, step, 2*step, ...; a chunk at s carries
    # n - s - overlap NEW tokens vs its predecessor (which already
    # covers up to s + overlap), so the last start is the largest
    # multiple of step with s <= n - overlap - min_chunk_tokens —
    # anything later is fully contained in the previous chunk
    last_start = F.greatest(
        F.lit(0),
        F.floor(
            (F.size("_tk") - F.lit(overlap + min_chunk_tokens))
            / F.lit(step)
        )
        * F.lit(step),
    ).cast("int")
    starts = F.sequence(F.lit(0), last_start, F.lit(step))
    chunks = base.select(
        id_col,
        F.posexplode(
            F.transform(
                starts,
                lambda s: F.slice(F.col("_tk"), s + 1, max_tokens),
            )
        ).alias("chunk_id", "_ck"),
    )
    return chunks.select(
        id_col,
        "chunk_id",
        F.concat_ws(" ", F.col("_ck")).alias("chunk_text"),
        F.size("_ck").alias("n_tokens"),
    )
