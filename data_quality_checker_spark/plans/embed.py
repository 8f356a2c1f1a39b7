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
    "exact_text_groups",
    "semantic_dedup_text",
    "ivf_index_from_text",
    "load_text_index",
    "search_text",
]


def _id_type(df: DataFrame, id_col: str) -> str:
    t = dict(df.dtypes).get(id_col)
    if t is None:
        raise ValueError(f"no column {id_col!r} in {df.columns}")
    return t


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
    from data_quality_checker_spark.tuning import parallel_input

    # scan-parallelism floor (tuning module): tokenize+hash runs on
    # every core even when the input is one parquet row group
    return (
        parallel_input(df.filter(F.col(text_col).isNotNull()))
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
    from data_quality_checker_spark.tuning import adaptive_coalesce

    tb = _token_buckets(df, id_col, text_col, dim)
    # adaptive_coalesce on every distinct/agg below: their post-shuffle
    # stages otherwise run at the session's full shuffle width (256
    # near-empty tasks per stage under the fixed-task-count bench
    # session — round-7; identity at cluster scale, values untouched)
    per_doc = adaptive_coalesce(tb.distinct(), df)
    # doc count as a broadcast scalar subquery, not a blocking driver
    # .count() round-trip (round-7; (n+1) cast double is exact below
    # 2^53 so the smoothing math matches the scalar form; the presence
    # subtree was scanned twice before — count + groupBy — and still
    # is, now inside ONE job)
    n_row = adaptive_coalesce(
        per_doc.select("id").distinct(), df
    ).agg(F.count("*").alias("_n"))
    return (
        adaptive_coalesce(
            per_doc.groupBy("bucket").agg(F.count("*").alias("_dfb")),
            df,
        )
        .crossJoin(F.broadcast(n_row))
        .select(
            "bucket",
            (
                F.log(
                    (F.col("_n") + F.lit(1)).cast("double")
                    / (F.col("_dfb") + F.lit(1.0))
                )
                + F.lit(1.0)
            ).alias("idf"),
        )
    )


def _assemble_arrow(kv: DataFrame, id_type: str, dim: int, normalize: bool):
    """Arrow dense assembly: scatter each row's (buckets, weights)
    arrays into a numpy zero row, then L2-normalize with a SEQUENTIAL
    per-dimension accumulation — the same left-to-right IEEE754 order
    as the Catalyst fold, so the two assembly paths are bit-identical
    (np.sum's pairwise summation would differ in ulps and could flip a
    6dp oracle rounding). The per-batch work is one fancy-indexed
    assign per row plus dim vectorized column ops — this replaces the
    interpreted dim-map-probes + 2*dim-step fold per row that made the
    'sql' assembly the measured hot spot (50.8 s of a 63 s
    semantic_dedup_text e2e at 210k docs)."""
    import numpy as np
    import pandas as pd

    schema = f"id {id_type}, v array<double>"

    def gen(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            V = np.zeros((n, dim), dtype=np.float64)
            bs, ws = pdf["bs"].values, pdf["ws"].values
            for i in range(n):
                b = np.asarray(bs[i], dtype=np.int64)
                w = np.asarray(ws[i], dtype=np.float64)
                # mask the unique_ids sentinel (bucket -1): numpy
                # would otherwise scatter it into the LAST column
                m = b >= 0
                V[i, b[m]] = w[m]
            if normalize:
                acc = np.zeros(n, dtype=np.float64)
                for j in range(dim):  # sequential: matches the fold
                    acc = acc + V[:, j] * V[:, j]
                nrm = np.sqrt(acc)
                ok = nrm > 0
                V[ok] = V[ok] / nrm[ok, None]
            yield pd.DataFrame(
                {"id": pdf["id"].values, "v": list(V)}
            )

    return kv.mapInPandas(gen, schema)


def hashed_doc_vectors(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 128,
    idf: DataFrame | None = None,
    use_idf: bool = True,
    normalize: bool = True,
    vec_col: str = "embedding",
    impl: str = "sql",
    unique_ids: bool = False,
) -> DataFrame:
    """Hashed TF(-IDF) document vectors: one row per input row
    (``(id, embedding array<double>)``), token-less or NULL texts get
    the all-zero vector (semantic_dedup's norm guard already excludes
    zero vectors from pairing; they pass through as uniques).

    ``idf`` — a (bucket, idf) table from :func:`hashing_idf`; computed
    internally when ``use_idf`` and omitted. Pass the CORPUS table when
    embedding queries. ``normalize`` L2-normalizes (cosine becomes a
    dot product downstream).

    ``impl`` — 'sql' (default): pure-Catalyst dense assembly, the
    engine-portable form the doc_embed_hashing DuckDB twin pins.
    'arrow': identical tokenize/TF/IDF stages, numpy scatter +
    sequential-order normalize for the dense assembly — bit-identical
    output (pinned by test), ~5x the assembly rate; the scale path
    semantic_dedup_text forwards to.

    When the IDF table is computed internally (``use_idf`` and no
    ``idf`` passed), the TF aggregate is persisted and BOTH IDF inputs
    are derived from it — its rows are exactly the distinct
    (id, bucket) presence pairs hashing_idf built from a second full
    tokenize pass, and the doc count is a distinct-id count over the
    same cache. One corpus tokenize pass instead of three (round-7;
    values identical: same integer counts feed the same smoothing
    formula). The cache rides the returned frame's ``_cached_deps`` —
    call dedup.release_cache (or unpersist the dep) once consumed;
    composing wrappers (semantic_dedup_text, the pipeline semantic
    stage) already do.

    ``unique_ids`` — caller asserts ``id_col`` values are unique (one
    row per id). The all-ids output is then produced by unioning one
    weightless sentinel entry per id into the per-id aggregation
    instead of a trailing left-outer join back to the id list: vector
    values are identical (the sentinel's bucket -1 is never scattered
    or probed), but the join — whose both-sides exchanges a
    fixed-plan session materializes even when the join itself runs
    broadcast — disappears (round-7). With duplicate or multiple-NULL
    ids this form returns ONE row per distinct id instead of one per
    input row, hence opt-in; id-keyed consumers (semantic_dedup_text,
    whose keep set is an id semi-join) qualify."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    if impl not in ("sql", "arrow"):
        raise ValueError(f"impl must be 'sql' or 'arrow', got {impl!r}")
    from data_quality_checker_spark.tuning import adaptive_coalesce

    # reduce widths derived from the corpus size (tuning module):
    # identity at cluster scale, collapses the tiny TF/assembly reduce
    # stages (and their Python-worker task counts) locally
    tf = adaptive_coalesce(
        _token_buckets(df, id_col, text_col, dim)
        .groupBy("id", "bucket")
        .agg(F.count("*").cast("double").alias("w")),
        df,
    )
    cached: tuple = ()
    if use_idf:
        if idf is not None:
            idf_tab = idf
        else:
            # one tokenize pass: TF rows ARE the distinct (id, bucket)
            # pairs, so document frequency and the doc count both come
            # from the cached aggregate instead of re-tokenizing. The
            # doc count rides as a 1-row cross join rather than a
            # driver .count() round-trip — the whole embed stays one
            # lazy DAG ((n+1) as a double is exact for any count below
            # 2^53, so the smoothing math is bit-identical to the
            # scalar form the oracle pins).
            tf = tf.persist()
            cached = (tf,)
            # adaptive widths on the distinct/agg (same rationale as
            # hashing_idf: fixed-task-count sessions otherwise pay a
            # full-width near-empty stage per aggregate, round-7)
            n_row = adaptive_coalesce(
                tf.select("id").distinct(), df
            ).agg(F.count("*").alias("_n"))
            idf_tab = (
                adaptive_coalesce(
                    tf.groupBy("bucket").agg(
                        F.count("*").alias("_dfb")
                    ),
                    df,
                )
                .crossJoin(F.broadcast(n_row))
                .select(
                    "bucket",
                    (
                        F.log(
                            (F.col("_n") + F.lit(1)).cast("double")
                            / (F.col("_dfb") + F.lit(1.0))
                        )
                        + F.lit(1.0)
                    ).alias("idf"),
                )
            )
        # <= dim rows: always broadcastable
        tf = tf.join(F.broadcast(idf_tab), "bucket", "left").select(
            "id",
            "bucket",
            (F.col("w") * F.coalesce(F.col("idf"), F.lit(1.0))).alias("w"),
        )
    if unique_ids:
        # one sentinel (bucket -1, weight 0) per id: every id then
        # reaches the per-id aggregation, so the dense assembly emits
        # the zero vector for token-less/NULL texts directly and the
        # trailing left-outer join below is skipped. -1 is outside the
        # [0, dim) probe range of both assembly paths.
        sentinel = df.select(
            F.col(id_col).alias("id"),
            F.lit(-1).cast("int").alias("bucket"),
            F.lit(0.0).alias("w"),
        )
        tf = tf.unionByName(sentinel)
    entries = adaptive_coalesce(
        tf.groupBy("id").agg(
            F.collect_list(F.struct(F.col("bucket"), F.col("w"))).alias(
                "e"
            )
        ),
        df,
    )
    if impl == "arrow":
        # aligned (buckets, weights) arrays split from ONE
        # collect_list of structs — two separate collect_lists would
        # not guarantee a shared order
        kv_arrays = entries.select(
            "id",
            F.col("e.bucket").alias("bs"),
            F.col("e.w").alias("ws"),
        )
        vecs = _assemble_arrow(
            kv_arrays, _id_type(df, id_col), dim, normalize
        )
    else:
        kv = entries.select("id", F.map_from_entries("e").alias("kv"))
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
    if unique_ids:
        out = vecs.select(
            F.col("id").alias(id_col), F.col("v").alias(vec_col)
        )
    else:
        zero = F.array_repeat(F.lit(0.0), dim)
        out = (
            df.select(F.col(id_col).alias("id"))
            .join(vecs, "id", "left")
            .select(
                F.col("id").alias(id_col),
                F.coalesce(F.col("v"), zero).alias(vec_col),
            )
        )
    out._cached_deps = cached
    return out


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


def exact_text_groups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    flags: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(member, rep_of): the exact-text duplicate collapse shared by
    :func:`semantic_dedup_text` and the pipeline's semantic stage —
    ``member`` = (_mid, _tk[, *flags]) with _tk = md5 of the
    (NULL-folded) text, ``rep_of`` = (_tk, _rid[, *<flag>g]) with
    _rid = the group's min id and each flag min-aggregated (flags are
    constant within a group — same text — so min is just transport).
    Only (id, 16-byte md5, flag) tuples shuffle; texts never travel."""
    from data_quality_checker_spark.tuning import adaptive_coalesce

    flags = flags or {}
    member = df.select(
        F.col(id_col).alias("_mid"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("_tk"),
        *[v.alias(k) for k, v in flags.items()],
    )
    # adaptive width on the group aggregate's post-shuffle stage
    # (fixed-task-count sessions with AQE coalescing off otherwise run
    # it at the full shuffle-partition constant — round-7)
    rep_of = adaptive_coalesce(
        member.groupBy("_tk").agg(
            F.min("_mid").alias("_rid"),
            *[F.min(k).alias(f"{k}g") for k in flags],
        ),
        df,
    )
    return member, rep_of


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
    exact_group: bool = True,
) -> DataFrame:
    """SemDeDup straight from text: embed -> semantic_dedup keep set ->
    semi-join the ORIGINAL rows (all columns untouched, embeddings
    never materialize outside the dedup subplan). A real user's first
    semantic-dedup run starts here, not at a vectors table.

    ``exact_group`` (default on) collapses exact-text duplicates to
    one min-id representative BEFORE the vector stages and expands the
    verdict back after. Exact copies embed to the SAME vector, so a
    group of m copies forms an m^2/2 clique of cosine-1.0 pairs inside
    one cell — pure quadratic waste the representative carries alone
    (measured on the 210k-doc sustained corpus: 13% exact-dup rows
    produced 63% of all tau-pairs). Semantics are preserved exactly
    relative to running SemDeDup over the same representative set:
    within a group every member ties on cos_centroid, so the keep
    rule's (cos, id) min is always the min-id member — the
    representative — and non-representatives of token-BEARING groups
    are cosine-1.0 duplicates of it, dropped by construction.
    Token-LESS groups embed to the zero vector, which the norm guard
    passes through unpaired, so those members are all kept (identical
    to the ungrouped behavior). Two things DO shift relative to an
    exact_group=False run — both are valid SemDeDup drawings, not
    approximations: centroid seeds are drawn from representatives
    only (different cell boundaries), and the internally-computed IDF
    counts each distinct text once (dedup-before-stats — duplicated
    boilerplate no longer inflates bucket document frequencies, which
    moves weights and can flip near-tau cross-text pairs). To
    reproduce the ungrouped weights exactly, pass
    ``embed_kw={"idf": hashing_idf(df, ...)}`` computed over the full
    frame. The group/expand joins shuffle only (id, 16-byte md5)
    pairs — texts never travel."""
    from data_quality_checker_spark.operators.semdedup import (
        semantic_dedup,
    )
    from data_quality_checker_spark.tuning import (
        adaptive_coalesce,
        parallel_input,
    )

    if exact_group:
        # one shared scan-parallelism floor for BOTH consumers of the
        # raw text (the md5 group pass and the embed tokenize): the
        # identical repartition subtree is deduplicated by Spark's
        # ReuseExchange, so a single-row-group parquet corpus pays ONE
        # small shuffle and every map stage above it runs on all cores
        # (round-7; identity on already-split production scans)
        src = parallel_input(df.select(F.col(id_col), F.col(text_col)))
        member, rep_of = exact_text_groups(src, id_col, text_col)
        base = src.join(
            rep_of.select(F.col("_rid").alias(id_col)), id_col,
            "left_semi",
        )
    else:
        base = df
    # persisted: the embed subtree feeds FIVE consumers downstream
    # (centroid draw, assignment, the cell-pairs vectors join, the
    # keep-set anti-join, and the final semi-join back) — without the
    # persist each one re-executes the full tokenize/agg/assemble
    # plan (measured 14.4 s -> materialize-once on the sf0.1 bench
    # leg). n_docs x dim doubles, the same footprint the vector
    # operators already assume fits the cluster's storage fraction.
    ekw = dict(embed_kw or {})
    if embedder == "hashing":
        # the caller's impl choice ('arrow' = scale path) applies to
        # the embed assembly too — the two paths are bit-identical
        ekw.setdefault("impl", impl)
        # SemDeDup's keep set is an id semi-join, so this operator
        # already requires ids to be unique row identities; the
        # sentinel-union embed form (identical vectors, no trailing
        # join) is therefore safe here (round-7)
        ekw.setdefault("unique_ids", True)
    # adaptive_coalesce BEFORE the persist: the embed plan ends in a
    # join whose materialized exchange leaves the cache at the
    # session's full shuffle width (256 tiny partitions at bench
    # scale) — every cache consumer that crosses the Python boundary
    # (the arrow assignment, the centroid draw) then launches one
    # Arrow task per partition and the per-task worker round-trip
    # dwarfs the actual math (measured ~50 s of executor time across
    # 256 tasks for a 5k-doc corpus, round-7). The shuffle-free merge
    # is identity at cluster scale (tuning module contract).
    # width derived from the RAW input's size (``df``): ``base`` holds
    # a join, and Catalyst's default join stats are multiplicative in
    # bytes, so sizing from it would always saturate at the cap
    vecs = adaptive_coalesce(
        doc_vectors(base, id_col, text_col, embedder, dim, **ekw), df
    ).persist()
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
    if exact_group:
        # zero-vector representatives: their groups never pair (norm
        # guard), so EVERY member passes through — exactly what the
        # ungrouped run does with each member individually. (The
        # word2vec embedder DROPS token-less rows instead of zeroing
        # them, so there vecs has no zero rows and whole token-less
        # groups fall out — again identical to its ungrouped shape.)
        if embedder == "hashing" and ekw.get("idf") is None:
            # hashing embedder with its OWN corpus IDF: every token
            # contributes weight >= 1 (tf >= 1, smoothed idf >= 1), so
            # a rep's vector is zero IFF its text has no tokens — and
            # members share their rep's exact text, so the zero-group
            # member set is simply "rows whose own text tokenizes
            # empty" (NULL text included). One map-side filter over
            # the shared src scan replaces the member x rep_of x
            # zero_reps join chain and its re-executed group subtrees
            # (round-7; a CALLER-provided idf table could carry zero
            # weights, so that path keeps the general join form).
            zero_members = src.filter(
                F.coalesce(F.size(tokens(text_col)), F.lit(0)) == 0
            ).select(F.col(id_col))
        else:
            zero_reps = vecs.filter(
                F.aggregate(
                    "embedding", F.lit(0.0), lambda a, x: a + x * x
                )
                == 0.0
            ).select(F.col(id_col).alias("_rid"))
            zero_members = (
                member.join(rep_of, "_tk")
                .join(zero_reps, "_rid", "left_semi")
                .select(F.col("_mid").alias(id_col))
            )
        keep_ids = kept.select(id_col).unionByName(zero_members)
    else:
        keep_ids = kept.select(id_col)
    # left_semi never multiplies rows, so the union may carry the
    # zero representatives twice without a distinct
    out = df.join(keep_ids, id_col, "left_semi")
    # projections drop the attribute — re-attach so the caller's
    # dedup.release_cache(out) frees the embed persist (+ its internal
    # TF cache) and any dedup-side caches (the _cached_deps contract;
    # the fused arrow path holds none of its own)
    out._cached_deps = (
        (vecs,)
        + tuple(getattr(vecs, "_cached_deps", ()))
        + tuple(getattr(kept, "_cached_deps", ()))
    )
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
    uses_idf = embedder == "hashing" and kw.get("use_idf", True)
    if uses_idf:
        idf_tab = hashing_idf(df, id_col, text_col, dim)
        kw["idf"] = idf_tab
    # persisted: build_ivf_index consumes the embed subtree twice
    # (KMeans fit + the assignment pass) — materialize once. With a
    # storage_path the build is EAGER (assignments are written and
    # re-read), so the cache is released before returning; the
    # in-memory path hands the release to the caller via the
    # assignments frame's _cached_deps (the repo contract).
    vecs = doc_vectors(df, id_col, text_col, embedder, dim, **kw).persist()
    index = build_ivf_index(
        vecs,
        id_col=id_col,
        vec_col="embedding",
        num_centroids=num_centroids,
        sample_fraction=sample_fraction,
        seed=seed,
        storage_path=storage_path,
    )
    if storage_path is not None:
        vecs.unpersist()
    else:
        index.assignments._cached_deps = (vecs,) + tuple(
            getattr(index.assignments, "_cached_deps", ())
        )
    # how this index's vectors were produced — search_text refuses a
    # query embedding that cannot live in the same space
    index.embed_meta = {
        "embedder": embedder,
        "dim": dim,
        "uses_idf": uses_idf,
    }
    if storage_path is not None:
        # persist the meta (and the corpus IDF table) next to the
        # cell layout: the build-once/search-many workflow reopens
        # the index in a LATER session, exactly where the caller has
        # lost track of the build parameters — without this the
        # guards above silently vanish on reload (load_text_index
        # restores them)
        spark = df.sparkSession
        spark.createDataFrame(
            [(embedder, dim, uses_idf)],
            "embedder string, dim int, uses_idf boolean",
        ).write.mode("overwrite").parquet(f"{storage_path}/embed_meta")
        if idf_tab is not None:
            idf_tab.write.mode("overwrite").parquet(
                f"{storage_path}/idf"
            )
    return index, idf_tab


def load_text_index(spark, storage_path: str):
    """Reopen a text-built IVF index written by
    :func:`ivf_index_from_text` with ``storage_path``: restores the
    cell-partitioned layout (similarity.load_ivf_index), the
    ``embed_meta`` guard block, and the corpus IDF table. Returns
    ``(index, idf_table)`` — the same pair the builder returned, so
    :func:`search_text` keeps its mismatch guards across sessions."""
    from data_quality_checker_spark.operators.similarity import (
        load_ivf_index,
    )

    index = load_ivf_index(spark, storage_path)
    row = spark.read.parquet(f"{storage_path}/embed_meta").collect()[0]
    index.embed_meta = {
        "embedder": row["embedder"],
        "dim": int(row["dim"]),
        "uses_idf": bool(row["uses_idf"]),
    }
    idf_tab = None
    if index.embed_meta["uses_idf"]:
        idf_tab = spark.read.parquet(f"{storage_path}/idf")
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
    (query_id, id, cosine, rank) shape.

    Indexes built by :func:`ivf_index_from_text` carry ``embed_meta``;
    against it this function REFUSES mismatches that would otherwise
    return confidently wrong neighbors: a non-hashing (word2vec)
    index (query hashes would live in a different vector space), a
    dim mismatch, and a missing corpus IDF when the index used one
    (embedding queries against their OWN idf silently skews weights).
    Raw build_ivf_index indexes carry no meta and are unguarded."""
    from data_quality_checker_spark.operators.similarity import (
        search_ivf,
    )

    kw = dict(embed_kw or {})
    if idf is not None:
        kw["idf"] = idf
    meta = getattr(index, "embed_meta", None)
    if meta is not None:
        if meta["embedder"] != "hashing":
            raise ValueError(
                "search_text embeds queries with the hashing embedder, "
                f"but this index was built with embedder="
                f"{meta['embedder']!r} — the spaces are incompatible; "
                "embed queries with the same model and use search_ivf"
            )
        if meta["dim"] != dim:
            raise ValueError(
                f"index was built at dim={meta['dim']}, queries at "
                f"dim={dim}"
            )
        # the query weighting must match the corpus BOTH ways: an
        # IDF-weighted query against a raw-TF index is as silently
        # skewed as the reverse
        kw.setdefault("use_idf", meta["uses_idf"])
        if bool(kw["use_idf"]) != bool(meta["uses_idf"]):
            raise ValueError(
                f"query use_idf={kw['use_idf']} conflicts with the "
                f"index build (uses_idf={meta['uses_idf']})"
            )
        if meta["uses_idf"]:
            if "idf" not in kw:
                raise ValueError(
                    "index was built with a corpus IDF table; pass the "
                    "idf returned by ivf_index_from_text / "
                    "load_text_index — embedding queries against their "
                    "own IDF silently skews ranking"
                )
        elif kw.get("idf") is not None:
            raise ValueError(
                "index was built WITHOUT IDF weighting — drop the idf "
                "argument"
            )
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
