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

from data_quality_checker_spark.functions.text import bind_once, tokens

__all__ = ["chunk_documents", "pack_sequences"]


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
    def _chunks_bound(tk):
        # tk is a HOF lambda variable (functions/text.bind_once): the
        # token array evaluates ONCE per row even if the optimizer
        # collapses the _tk projection back into this expression —
        # an inlined tokenize would otherwise re-run per chunk start
        last_start = F.greatest(
            F.lit(0),
            F.floor(
                (F.size(tk) - F.lit(overlap + min_chunk_tokens))
                / F.lit(step)
            )
            * F.lit(step),
        ).cast("int")
        starts = F.sequence(F.lit(0), last_start, F.lit(step))
        return F.transform(
            starts, lambda s: F.slice(tk, s + 1, max_tokens)
        )

    chunks = base.select(
        id_col,
        F.posexplode(bind_once(F.col("_tk"), _chunks_bound)).alias(
            "chunk_id", "_ck"
        ),
    )
    return chunks.select(
        id_col,
        "chunk_id",
        F.concat_ws(" ", F.col("_ck")).alias("chunk_text"),
        F.size("_ck").alias("n_tokens"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 2048,
    num_buckets: int = 64,
    bucket_col=None,
    token_count_col=None,
    order_col=None,
) -> DataFrame:
    """GPT-style sequence packing: documents are concatenated in a
    deterministic order and split into fixed ``max_tokens`` training
    sequences, documents spanning sequence boundaries (the standard
    pretraining loader prep — zero padding waste except the final
    sequence per bucket). No reference ancestor; training-data
    extension.

    Output: one row per (document x sequence it occupies) —
    ``(id_col, bucket, seq_in_bucket, seq_id, doc_token_start,
    n_tokens_in_seq, n_tokens_doc)`` where ``doc_token_start`` is the
    0-based offset INTO THE DOCUMENT of the first token landing in
    this sequence, so a loader can reassemble every sequence from the
    documents alone. Zero-token / NULL docs produce no rows.

    Scale shape: concatenation order must be total, but a single
    global order would serialize the window — so packing is
    per-bucket (``xxhash64(id) % num_buckets`` by default, or pass
    ``bucket_col``): one shuffle into ``num_buckets`` ordered
    partitions, one running-sum window per bucket, one explode. Each
    bucket wastes at most ``max_tokens - 1`` trailing tokens; at
    crawl scale buckets number in the thousands and the waste is
    noise. The order WITHIN a bucket is ``xxhash64(id)`` (hash order
    = a deterministic shuffle, the mix pretraining wants; retry/
    resume-stable, never rand() — the repo's sampling rule).

    ``token_count_col``: optional pre-computed token-count column
    (skips tokenization — e.g. reuse BPE counts); default counts
    ``tokens(text)``. ``order_col``: optional explicit within-bucket
    order (ties broken by id) — the engine-portable hook the DuckDB
    oracle twin uses; default hash order."""
    from pyspark.sql import Window

    if max_tokens < 1:
        raise ValueError("need max_tokens >= 1")
    if num_buckets < 1:
        raise ValueError("need num_buckets >= 1")
    c_id = F.col(id_col)
    tok_n = (
        F.col(token_count_col)
        if isinstance(token_count_col, str)
        else token_count_col
        if token_count_col is not None
        else F.size(tokens(F.col(text_col)))
    )
    bucket = (
        F.col(bucket_col)
        if isinstance(bucket_col, str)
        else bucket_col
        if bucket_col is not None
        else F.pmod(F.xxhash64(c_id), F.lit(num_buckets)).cast("int")
    )
    base = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            c_id.alias("_id"),
            bucket.alias("bucket"),
            tok_n.cast("long").alias("n_tokens_doc"),
            (
                F.col(order_col)
                if isinstance(order_col, str)
                else order_col
                if order_col is not None
                else F.xxhash64(c_id)
            ).alias("_ord"),
        )
        .filter(F.col("n_tokens_doc") > 0)
    )
    # explicit ROWS frame: the default RANGE frame makes orderBy PEERS
    # (rows tied on (_ord, _id) — duplicate ids) share one cumulative
    # sum, which would hand two docs the same span and break token
    # conservation; ROWS gives each row its strict running prefix
    w = Window.partitionBy("bucket").orderBy("_ord", "_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum("n_tokens_doc").over(w)
    spans = base.select(
        "_id",
        "bucket",
        "n_tokens_doc",
        (cum - F.col("n_tokens_doc")).alias("_start"),  # global offset
        cum.alias("_end"),
    )
    # sequences this doc touches: start div max .. (end-1) div max —
    # integer div, not floor(double /): token offsets at 10^12-doc
    # scale exceed double's 53-bit exact-integer range
    first_s = F.expr(f"_start div {max_tokens}")
    last_s = F.expr(f"(_end - 1) div {max_tokens}")
    out = spans.select(
        "_id",
        "bucket",
        "n_tokens_doc",
        "_start",
        "_end",
        F.explode(F.sequence(first_s, last_s)).alias("seq_in_bucket"),
    )
    seq_lo = F.col("seq_in_bucket") * max_tokens
    seq_hi = seq_lo + max_tokens
    return out.select(
        F.col("_id").alias(id_col),
        "bucket",
        F.col("seq_in_bucket").cast("long").alias("seq_in_bucket"),
        F.concat_ws(
            "-", F.col("bucket"), F.col("seq_in_bucket")
        ).alias("seq_id"),
        (F.greatest(seq_lo, F.col("_start")) - F.col("_start"))
        .cast("long")
        .alias("doc_token_start"),
        (F.least(seq_hi, F.col("_end")) - F.greatest(seq_lo, F.col("_start")))
        .cast("long")
        .alias("n_tokens_in_seq"),
        "n_tokens_doc",
    )
