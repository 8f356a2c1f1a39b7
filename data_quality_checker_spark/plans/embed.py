"""Text -> embedding bridge: produce document vectors IN-REPO and feed
them to the vector operators (semantic dedup, IVF/ANN search), so a
semantic-dedup run can start from ``documents(text)`` alone instead of
a pre-computed embeddings table.

Two embedders, both returning ``(id, embedding array<double>)``:

- :func:`hashed_doc_vectors` — hashed TF-IDF ("hashing trick",
  Weinberger et al. 2009): token -> md5-prefix bucket in [0, dim),
  TF x smoothed IDF weight, dense array assembly, L2 normalization —
  100% Catalyst expressions (two narrow shuffles: (id, bucket) agg and
  the per-id map assembly; the dim-row IDF dimension broadcasts). The
  md5 hash family (not xxhash64) is deliberate: every stage has an
  exact DuckDB twin, so the full vector content is oracle-pinned
  (``doc_embed_hashing``), the same portability trick as
  q_minhash_lsh_portable. Deterministic by construction — no rand(),
  no training.
- :func:`word2vec_doc_vectors` — Spark ML Word2Vec mean-pooled doc
  vectors (the trained path; reference ancestor
  nlp_analyzer.py:779-817 trains Word2Vec for pairwise similarity but
  never bridges doc vectors into dedup/search). Deterministic for a
  fixed (seed, num_partitions) pair — Word2Vec's gradient updates
  merge per partition, so determinism REQUIRES pinning num_partitions
  (default 1; raise it for corpus-scale training and accept
  run-to-run vector jitter, cosine structure is stable).

End-to-end wrappers: :func:`semantic_dedup_text` (embed -> SemDeDup
keep set -> semi-join back, original columns untouched) and
:func:`ivf_index_from_text` / :func:`search_text` (embed -> coarse
quantizer -> cell-pruned cosine top-k, query side embedded with the
CORPUS IDF table so query and corpus weights agree).

Scale notes (100 TB): the hashing embedder is shuffle-bounded by the
(id, bucket) aggregate — nnz per doc, never dim x docs; the dense
assembly is one map lookup per dimension inside a single projection.
IDF is a dim-row broadcast. Word2Vec fit is the one driver-coordinated
stage (Spark ML); at corpus scale fit on a deterministic md5-threshold
sample (plans/sampling.sample_fraction) and transform everything.
semantic_dedup / build_ivf_index downstream keep their own bucketed /
cell-pruned shapes — nothing here adds an all-pairs stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_quality_checker_spark.functions.text import tokens

__all__ = [
    "hashing_idf",
    "hashed_doc_vectors",
    "word2vec_doc_vectors",
    "doc_vectors",
    "semantic_dedup_text",
    "ivf_index_from_text",
    "search_text",
]


def _bucket(tok, dim: int):
    """md5-prefix bucket in [0, dim): 13 hex chars = 52 bits, always
    positive in a long, so ``%`` == pmod and the DuckDB twin
    ``('0x'||substr(md5(t),1,13))::bigint % dim`` lands on the same
    cell. int-typed to match F.sequence's index element type in the
    dense-assembly map lookup."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 13), 16, 10).cast("long") % dim
    ).cast("int")


def _token_buckets(
    df: DataFrame, id_col: str, text_col: str, dim: int
) -> DataFrame:
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.explode(tokens(text_col)).alias("t"),
        )
        .select("id", _bucket(F.col("t"), dim).alias("bucket"))
    )


def hashing_idf(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    dim: int = 128,
) -> DataFrame:
    """Per-bucket smoothed IDF over the corpus:
    ``ln((N + 1) / (df_b + 1)) + 1`` where ``df_b`` counts documents
    containing the bucket and N counts documents with any token.
    Returns ``(bucket int, idf double)`` — at most ``dim`` rows, the
    broadcast dimension every embed call joins against. Compute ONCE
    per corpus and pass to both corpus and query embeds so their
    weights agree (search_text does this)."""
    tb = _token_buckets(df, id_col, text_col, dim)
    per_doc = tb.distinct()  # (id, bucket): presence, not counts
    n_docs = per_doc.select("id").distinct().count()  # scalar, driver
    return per_doc.groupBy("bucket").agg(
        (
            F.log((F.lit(float(n_docs + 1))) / (F.count("*") + F.lit(1.0)))
            + F.lit(1.0)
        ).alias("idf")
    )


def hashed_doc_vectors(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 128,
    idf: DataFrame | None = None,
    use_idf: bool = True,
    normalize: bool = True,
    vec_col: str = "embedding",
) -> DataFrame:
    """Hashed TF(-IDF) document vectors, pure Catalyst: one row per
    input row (``(id, embedding array<double>)``), token-less or NULL
    texts get the all-zero vector (semantic_dedup's norm guard already
    excludes zero vectors from pairing; they pass through as uniques).

    ``idf`` — a (bucket, idf) table from :func:`hashing_idf`; computed
    internally when ``use_idf`` and omitted. Pass the CORPUS table when
    embedding queries. ``normalize`` L2-normalizes (cosine becomes a
    dot product downstream)."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    tf = (
        _token_buckets(df, id_col, text_col, dim)
        .groupBy("id", "bucket")
        .agg(F.count("*").cast("double").alias("w"))
    )
    if use_idf:
        idf_tab = idf if idf is not None else hashing_idf(
            df, id_col, text_col, dim
        )
        # <= dim rows: always broadcastable
        tf = tf.join(F.broadcast(idf_tab), "bucket", "left").select(
            "id",
            "bucket",
            (F.col("w") * F.coalesce(F.col("idf"), F.lit(1.0))).alias("w"),
        )
    kv = tf.groupBy("id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bucket"), F.col("w")))
        ).alias("kv")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.col("kv")[i], F.lit(0.0)),
    )
    vecs = kv.select("id", dense.alias("v"))
    if normalize:
        nrm = F.sqrt(
            F.aggregate(
                F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x
            )
        )
        vecs = vecs.select(
            "id",
            F.when(
                nrm > 0, F.transform(F.col("v"), lambda x: x / nrm)
            )
            .otherwise(F.col("v"))
            .alias("v"),
        )
    zero = F.array_repeat(F.lit(0.0), dim)
    return (
        df.select(F.col(id_col).alias("id"))
        .join(vecs, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("v"), zero).alias(vec_col),
        )
    )


def word2vec_doc_vectors(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 32,
    min_count: int = 1,
    seed: int = 42,
    num_partitions: int = 1,
    max_iter: int = 1,
    vec_col: str = "embedding",
) -> DataFrame:
    """Word2Vec doc vectors: Spark ML fit on the corpus tokens, then
    the model's transform (the MEAN of the word vectors — mean-pooling
    is Word2VecModel's documented document representation). Rows with
    no tokens are dropped (no word vectors to pool — unlike the
    hashing embedder there is no meaningful zero point). Deterministic
    iff (seed, num_partitions) are pinned; see module docstring."""
    from pyspark.ml.feature import Word2Vec
    from pyspark.ml.functions import vector_to_array

    tokd = df.select(
        F.col(id_col).alias("id"), tokens(text_col).alias("words")
    ).filter(F.size("words") > 0)
    model = Word2Vec(
        vectorSize=dim,
        minCount=min_count,
        seed=seed,
        numPartitions=num_partitions,
        maxIter=max_iter,
        inputCol="words",
        outputCol="_w2v",
    ).fit(tokd)
    return (
        model.transform(tokd)
        .select(
            F.col("id").alias(id_col),
            vector_to_array("_w2v").cast("array<double>").alias(vec_col),
        )
    )


def doc_vectors(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    embedder: str = "hashing",
    dim: int = 128,
    **kw,
) -> DataFrame:
    """Dispatch: ``embedder='hashing'`` (oracle-pinned, deterministic,
    zero-training default) or ``'word2vec'`` (trained). Extra kwargs
    flow to the chosen embedder."""
    if embedder == "hashing":
        return hashed_doc_vectors(df, id_col, text_col, dim=dim, **kw)
    if embedder == "word2vec":
        return word2vec_doc_vectors(df, id_col, text_col, dim=dim, **kw)
    raise ValueError(
        f"embedder must be 'hashing' or 'word2vec', got {embedder!r}"
    )


def semantic_dedup_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    embedder: str = "hashing",
    dim: int = 128,
    k: int = 16,
    tau: float = 0.9,
    keep: str = "low",
    impl: str = "sql",
    lloyd_iters: int = 0,
    embed_kw: dict | None = None,
) -> DataFrame:
    """SemDeDup straight from text: embed -> semantic_dedup keep set ->
    semi-join the ORIGINAL rows (all columns untouched, embeddings
    never materialize outside the dedup subplan). A real user's first
    semantic-dedup run starts here, not at a vectors table."""
    from data_quality_checker_spark.operators.semdedup import (
        semantic_dedup,
    )

    vecs = doc_vectors(
        df, id_col, text_col, embedder, dim, **(embed_kw or {})
    )
    kept = semantic_dedup(
        vecs,
        id_col=id_col,
        vec_col="embedding",
        k=k,
        tau=tau,
        dim=dim,
        keep=keep,
        impl=impl,
        lloyd_iters=lloyd_iters,
    )
    out = df.join(kept.select(id_col), id_col, "left_semi")
    # projections drop the attribute — re-attach so the caller's
    # dedup.release_cache(out) frees the assignment persist +
    # clustering checkpoint (the established _cached_deps contract)
    out._cached_deps = tuple(getattr(kept, "_cached_deps", ()))
    return out


def ivf_index_from_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    embedder: str = "hashing",
    dim: int = 128,
    num_centroids: int = 16,
    sample_fraction: float = 1.0,
    seed: int = 42,
    storage_path: str | None = None,
    embed_kw: dict | None = None,
):
    """Text corpus -> IVF index: embed, then build the coarse
    quantizer + cell-partitioned assignments (similarity.
    build_ivf_index — with ``storage_path`` the cell layout persists
    for partition-pruned search). Returns ``(index, idf_table)``;
    ``idf_table`` is None for non-hashing embedders, otherwise the
    CORPUS IDF table that :func:`search_text` must embed queries with
    (query weights computed against a different corpus' IDF would
    silently skew ranking)."""
    from data_quality_checker_spark.operators.similarity import (
        build_ivf_index,
    )

    kw = dict(embed_kw or {})
    idf_tab = None
    if embedder == "hashing" and kw.get("use_idf", True):
        idf_tab = hashing_idf(df, id_col, text_col, dim)
        kw["idf"] = idf_tab
    vecs = doc_vectors(df, id_col, text_col, embedder, dim, **kw)
    index = build_ivf_index(
        vecs,
        id_col=id_col,
        vec_col="embedding",
        num_centroids=num_centroids,
        sample_fraction=sample_fraction,
        seed=seed,
        storage_path=storage_path,
    )
    return index, idf_tab


def search_text(
    index,
    queries_df: DataFrame,
    idf: DataFrame | None = None,
    id_col: str = "query_id",
    text_col: str = "text",
    dim: int = 128,
    k: int = 5,
    nprobe: int = 2,
    embed_kw: dict | None = None,
) -> DataFrame:
    """Text queries against a text-built IVF index: embeds the query
    side with the SAME hashing parameters (and the corpus IDF table
    from :func:`ivf_index_from_text`), then cell-pruned cosine top-k
    (similarity.search_ivf). Returns its
    (query_id, id, cosine, rank) shape."""
    from data_quality_checker_spark.operators.similarity import (
        search_ivf,
    )

    kw = dict(embed_kw or {})
    if idf is not None:
        kw["idf"] = idf
    qvecs = hashed_doc_vectors(
        queries_df, id_col, text_col, dim=dim, **kw
    )
    return search_ivf(
        index,
        qvecs,
        k=k,
        id_col=id_col,
        vec_col="embedding",
        n_probe=nprobe,
    )
