"""Similarity search over embedding columns (array<float>).

Two tiers (both return (query_id, id, cosine, rank)):

 - brute-force top-k: broadcast the (small) query set, one streaming
   pass over the corpus, per-query top-k via window. Exact; the
   baseline for recall measurement. O(corpus x queries) but a single
   scan with no corpus shuffle beyond the final tiny top-k.
 - LSH-bucketed ANN: sign-LSH with multiple probe tables; corpus
   bucketed once (reusable), query joins its buckets only. The 100 TB
   path — touches only colliding buckets.

The reference's nearest ancestor is the TF-IDF cosine similarity
matrix (nlp_analyzer.py:745-777), which materializes n^2 — never done
here."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_quality_checker_spark.operators.dedup import cosine_expr, sign_lsh_key

__all__ = [
    "topk_bruteforce",
    "topk_lsh",
    "topk_ivf",
    "IvfIndex",
    "build_ivf_index",
    "append_ivf_index",
    "load_ivf_index",
    "search_ivf",
]


def topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query. `queries` must be small enough to
    broadcast (the planner is told so explicitly)."""
    from data_quality_checker_spark.tuning import parallel_input

    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
    )
    # scan-parallelism floor (tuning module): the per-row cosine fold
    # against every broadcast query otherwise runs in ONE task when
    # the corpus is a single-row-group parquet file (round-7;
    # untouched for already-split production scans)
    c = parallel_input(
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("cv"))
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            "id",
            cosine_expr(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    from data_quality_checker_spark.tuning import scaled_partitions

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("id")
    )
    # pre-partition by query_id at the scale-derived width (tuning
    # module): the rank window reuses the distribution — still one
    # exchange, sized by the data instead of the session constant
    return (
        scored.filter(F.col("cosine").isNotNull())
        .repartition(scaled_partitions(corpus), "query_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_tables: int = 4,
    num_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: `num_tables` independent sign-LSH tables;
    a candidate is any corpus vector sharing a bucket with the query in
    any table. Exact cosine + top-k on candidates only. Recall rises
    with num_tables; cost stays ~bucket-sized."""
    def keyed(df: DataFrame, ident: str, vec: str) -> DataFrame:
        keys = F.array(
            *[
                F.concat(
                    F.lit(f"t{t}:"),
                    sign_lsh_key(F.col(vec), dim, num_planes, seed + t),
                )
                for t in range(num_tables)
            ]
        )
        return df.select(
            F.col(ident).alias("_id"), F.col(vec).alias("_v"),
            F.explode(keys).alias("bk"),
        )

    c = keyed(corpus, id_col, vec_col).withColumnsRenamed(
        {"_id": "id", "_v": "cv"}
    )
    q = keyed(queries, id_col, vec_col).withColumnsRenamed(
        {"_id": "query_id", "_v": "qv"}
    )
    # Score every bucket collision immediately, THEN dedup table-level
    # duplicates with max(cosine) keyed on (query_id, id): the shuffle
    # payload is three scalars per candidate — never the embedding
    # arrays (a .distinct() over rows carrying qv/cv would shuffle the
    # full vectors and compare arrays for equality).
    scored = (
        c.join(F.broadcast(q), "bk")
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            "id",
            cosine_expr(F.col("qv"), F.col("cv")).alias("cosine"),
        )
        .groupBy("query_id", "id")
        .agg(F.max("cosine").alias("cosine"))
    )
    from data_quality_checker_spark.tuning import scaled_partitions

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("id")
    )
    # pre-partition by query_id at the scale-derived width (tuning
    # module): the rank window reuses the distribution — still one
    # exchange, sized by the data instead of the session constant
    return (
        scored.filter(F.col("cosine").isNotNull())
        .repartition(scaled_partitions(corpus), "query_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


@dataclass
class IvfIndex:
    """A built IVF index: the (tiny) coarse-quantizer centroids plus
    the corpus-to-cell assignment relation (id, cv, cell). When built
    with ``storage_path`` the assignment is a parquet table PARTITIONED
    BY cell, so a search probing n_probe cells reads only those
    partitions (partition pruning) — the disk layout IS the inverted
    file."""

    centroids: list[tuple[int, list[float]]]
    assignments: DataFrame


def _nearest_cells(
    df: DataFrame,
    ident: str,
    vec: str,
    probes: int,
    centroids: list[tuple[int, list[float]]],
) -> DataFrame:
    """n-probe nearest centroid cells per vector as a PURE PROJECTION:
    the centroid list is a compile-time literal, so each row computes
    its (distance, cell) array, sorts it (struct order = dist asc,
    cell asc — same tie-break a rank window would give), and explodes
    the first `probes` entries. Zero shuffle — the previous
    crossJoin + Window.partitionBy(_id) re-shuffled the entire
    embedding corpus once per build."""

    def sq_dist(center: list[float]):
        return F.aggregate(
            F.zip_with(
                F.col("_v").cast("array<double>"),
                F.lit(center),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    dc = F.array(
        *[
            F.struct(sq_dist(center).alias("d"), F.lit(cell).alias("cell"))
            for cell, center in centroids
        ]
    )
    nearest = F.slice(F.array_sort(dc), 1, probes)
    return (
        df.select(F.col(ident).alias("_id"), F.col(vec).alias("_v"))
        .select("_id", "_v", F.explode(nearest).alias("_dc"))
        .select("_id", "_v", F.col("_dc.cell").alias("cell"))
    )


def build_ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 16,
    sample_fraction: float = 1.0,
    seed: int = 42,
    storage_path: str | None = None,
) -> IvfIndex:
    """Fit the KMeans coarse quantizer (on a sample) and assign every
    corpus vector to its nearest cell in one shuffle-free projection.
    With ``storage_path``, the assignment is written as parquet
    partitioned by cell (plus a ``centroids`` table) and read back —
    build once, search many; :func:`load_ivf_index` reopens it."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias(
            "features"
        )
    )
    if sample_fraction < 1.0:
        train = train.sample(fraction=sample_fraction, seed=seed)
    km = KMeans(k=num_centroids, seed=seed, maxIter=10).fit(train)
    centroids = [
        (int(i), [float(x) for x in c])
        for i, c in enumerate(km.clusterCenters())
    ]
    assignments = _nearest_cells(
        corpus, id_col, vec_col, 1, centroids
    ).withColumnsRenamed({"_id": "id", "_v": "cv"})
    if storage_path is not None:
        spark = corpus.sparkSession
        # repartition BY CELL before the partitioned write: without it
        # every upstream task writes a file into every cell directory
        # (tasks x cells small files — measured 8k files for a 1M-row
        # index, and at crawl scale millions), which throttles the
        # probed read with open/seek overhead. One shuffle keyed by
        # cell -> one file per cell; KMeans keeps cells balanced
        # enough that per-cell tasks don't straggle.
        assignments.repartition(F.col("cell")).write.partitionBy(
            "cell"
        ).mode("overwrite").parquet(f"{storage_path}/assignments")
        spark.createDataFrame(
            centroids, "cell int, centroid array<double>"
        ).write.mode("overwrite").parquet(f"{storage_path}/centroids")
        assignments = spark.read.parquet(f"{storage_path}/assignments")
    return IvfIndex(centroids=centroids, assignments=assignments)


def append_ivf_index(
    new_corpus: DataFrame,
    storage_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Add a new vector batch to a disk-backed IVF index — the
    rolling-crawl form for the embedding modality (the
    minhash_index.append_minhash_index contract): ONLY the new batch
    is assigned, against the FROZEN coarse quantizer, and appended
    into the cell-partitioned assignment table. Work is proportional
    to the batch; the existing assignments are never read.

    Freezing the quantizer is the standard IVF add semantics (FAISS
    ``index.add()``): refitting KMeans per append would re-assign the
    WHOLE corpus (O(corpus), defeating the point) and silently move
    past vectors between cells. Quantizer drift under distribution
    shift is handled by a periodic REBUILD (build_ivf_index to a new
    path, swap in the orchestrator), not per-append refits. Ids must
    stay unique across the index lifetime (caller-owned, as in the
    MinHash index).

    Returns ``{"n_appended": ...}``."""
    spark = new_corpus.sparkSession
    index = load_ivf_index(spark, storage_path)
    # fail fast on shape/type drift vs the existing index: zip_with
    # null-pads a wrong-dim vector, so every centroid distance would
    # be NULL and the row lands in an arbitrary cell with no error —
    # and mixed float/double files break the later read
    want_t = dict(index.assignments.dtypes)["cv"]
    got_t = dict(new_corpus.select(F.col(vec_col).alias("cv")).dtypes)[
        "cv"
    ]
    if got_t != want_t:
        raise ValueError(
            f"vector column {vec_col!r} has type {got_t}, index stores "
            f"{want_t} — cast upstream before appending"
        )
    dim = len(index.centroids[0][1])
    # aggregate over the WHOLE batch, not a first-row probe: a batch
    # with mixed dimensions would pass a head() check on its first row
    # and the wrong-dim tail would be silently null-padded into
    # arbitrary cells — the exact failure this guard exists to stop
    d = F.coalesce(F.size(vec_col), F.lit(-1))  # NULL vector -> -1
    bad = new_corpus.agg(
        F.sum((d != F.lit(dim)).cast("long")).alias("n_bad"),
        F.min(d).alias("d_min"),
        F.max(d).alias("d_max"),
    ).head()
    if bad is not None and (bad["n_bad"] or 0) > 0:
        raise ValueError(
            f"vector column {vec_col!r} has {bad['n_bad']} rows whose "
            f"dimension (range {bad['d_min']}..{bad['d_max']}) differs "
            f"from the index quantizer's {dim}"
        )
    assignments = _nearest_cells(
        new_corpus, id_col, vec_col, 1, index.centroids
    ).withColumnsRenamed({"_id": "id", "_v": "cv"}).persist()
    try:
        # same one-file-per-cell discipline as build (see the
        # repartition note there); parquet append is per-file atomic.
        # n_appended counts the PERSISTED plan the write materialized —
        # re-counting new_corpus would re-run its whole upstream DAG
        # and could diverge from the rows actually written.
        assignments.repartition(F.col("cell")).write.partitionBy(
            "cell"
        ).mode("append").parquet(f"{storage_path}/assignments")
        n_appended = assignments.count()
    finally:
        assignments.unpersist()
    return {"n_appended": n_appended}


def load_ivf_index(spark, storage_path: str) -> IvfIndex:
    """Reopen an index written by build_ivf_index(storage_path=...)."""
    centroids = [
        (int(r["cell"]), [float(x) for x in r["centroid"]])
        for r in spark.read.parquet(f"{storage_path}/centroids")
        .orderBy("cell")
        .collect()
    ]
    return IvfIndex(
        centroids=centroids,
        assignments=spark.read.parquet(f"{storage_path}/assignments"),
    )


def search_ivf(
    index: IvfIndex,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
) -> DataFrame:
    """Top-k over the probed cells only: the (tiny) query-to-cells
    relation broadcasts into the assignment join, so a disk-backed
    index reads ~n_probe/num_centroids of the corpus (partition-pruned
    when the assignment table is partitioned by cell)."""
    query_cells = _nearest_cells(
        queries, id_col, vec_col, n_probe, index.centroids
    ).withColumnsRenamed({"_id": "query_id", "_v": "qv"})
    cands = index.assignments.join(
        F.broadcast(query_cells), "cell"
    ).filter(F.col("id") != F.col("query_id"))
    scored = cands.select(
        "query_id",
        "id",
        cosine_expr(
            F.col("qv").cast("array<double>"),
            F.col("cv").cast("array<double>"),
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 16,
    n_probe: int = 4,
    sample_fraction: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """One-shot IVF approximate top-k (build + search; see
    build_ivf_index/search_ivf for the build-once-search-many form).
    Recall rises with n_probe (n_probe == num_centroids -> exact)."""
    index = build_ivf_index(
        corpus, id_col, vec_col, num_centroids, sample_fraction, seed
    )
    return search_ivf(index, queries, k, id_col, vec_col, n_probe)
