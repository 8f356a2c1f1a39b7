"""SemDeDup-style semantic deduplication over an embedding column.

Lexical near-dedup (MinHash/SimHash, operators/dedup.py) catches
copies; SEMANTIC dedup catches re-tellings — documents whose token
streams differ but whose embeddings nearly coincide. Method follows
the published SemDeDup recipe (Abbas et al. 2023, arXiv:2303.09540,
public): cluster the embedding space into k cells, then inside each
cell mark pairs with cosine >= tau as semantic duplicates and keep
one representative per duplicate group — the member LEAST typical of
its cell (lowest cosine to centroid), which the paper measured as the
best keep rule. The reference repo stops at pairwise similarity
search (dataset_quality_checker/nlp_analyzer.py:886-918,
semantic_search_analysis); the clustering, the within-cell pair
restriction, and the keep rule are the training-data extension.

Scale shape (the whole point — the naive form is an O(n^2) cosine
cross join):
- centroid seeding is a deterministic hash-order draw (md5 of the id,
  the repo's retry-stable selection idiom — never rand()), k rows;
- assignment is a BROADCAST nested-loop join of the corpus against
  the k-row centroid table followed by one hash aggregate keyed on
  the doc id — partial aggregation collapses each id's k candidate
  rows map-side, so the exchange carries ONE row per document;
- pair generation self-joins on cell_id, so candidate volume is
  sum(cell_i^2), never n^2; pick k ~ n / target_cell_size to bound
  the quadratic term (the paper's operating regime). Cell sizes are
  data-dependent — audit with cell_sizes() before a big run;
- optional Lloyd refinement (lloyd_iters > 0) tightens cells with
  one reassignment + per-dimension mean per iteration (one narrow
  shuffle each); the default 0 keeps assignment a pure function of
  the input rows, which the cross-engine oracle twin pins.

Engine-portable contract (lloyd_iters=0): seeds, assignment argmax
(tie: cosine desc, cell_id asc), and the pair predicate are plain
relational algebra over list_cosine_similarity-equivalent math, so a
DuckDB twin reproduces them at 6dp (see
__spark_entry__.q_semantic_dedup_pairs).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_quality_checker_spark.operators.dedup import duplicate_clusters

_IMPLS = ("sql", "arrow")

__all__ = [
    "seed_centroids",
    "assign_cells",
    "lloyd_refine",
    "cell_sizes",
    "semantic_dedup_pairs",
    "semantic_dedup",
]


def _dot_fold(a, b):
    """Element-wise dot via zip_with + aggregate — the HOF fold.

    HONEST MEASUREMENT (51M 64-d dot products, local[16], two
    interleaved legs): this "interpreted lambda" form runs 25-26 s;
    the flat codegen'd getItem chain (a[0]*b[0] + ... + a[63]*b[63])
    runs 255-262 s with identical sums and ZERO janino failures —
    GetArrayItem is the slow path in this engine (per-access bounds/
    null checks defeat the JIT where the fold walks the unsafe array
    data in one specialized loop). Keep the fold; optimize by
    PRECOMPUTING norms so each pair costs one fold, not three."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(v):
    return F.sqrt(_dot_fold(v, v))


def _id_type(df: DataFrame, id_col: str) -> str:
    t = dict(df.dtypes).get(id_col)
    if t is None:
        raise ValueError(f"no column {id_col!r} in {df.columns}")
    return t


# centroid-block budget for the arrow assignment: peak score-matrix
# memory per worker = _SCORE_DOUBLES * 8 bytes (64 MB), independent
# of k — the guard VERDICT r04 item 6 asked for
_SCORE_DOUBLES = 8_000_000


def _assign_cells_arrow(
    base: DataFrame,
    centroids: DataFrame,
    id_type: str,
    with_vec: bool = False,
) -> DataFrame:
    """Arrow/numpy assignment: BLAS matmuls per batch against the
    collected k x dim centroid matrix (driver-bounded by k, the same
    contract as the IVF literal centers). ~100x the fold rate on the
    O(n*k) stage — the SemDeDup paper's own operating mode (faiss
    matmuls). Zero-norm vectors are dropped (no meaningful cosine);
    FP differs from the relational fold only in summation order, so
    argmax cells agree except on exact centroid ties.

    Memory bound at the paper's k=10^4-10^5 regime: a single
    batch x k score matrix is batch*k*8 bytes (an Arrow batch of 10k
    rows at k=10^5 would be 8 GB), so centroids are processed in
    BLOCKS with a running per-row max — peak score memory is capped
    at ~_SCORE_DOUBLES doubles (64 MB) per worker regardless of k,
    outputs identical (strict > keeps the first block hit = lowest
    cell_id, the same tie-break as single-matmul argmax). The k x dim
    centroid matrix itself stays whole (k=10^5 x 64d = 51 MB — fine);
    the relational 'sql' path is O(k) expression terms PER ROW and is
    the wrong tool past k~10^3 (documented crossover in BENCH.md).

    ``with_vec`` additionally emits each surviving row's L2-NORMALIZED
    vector (``vn``) — free here (the batch already holds Vn for the
    scoring matmul) and it lets the downstream cell stages consume the
    assignment directly instead of joining the vectors table back on
    id (round-7: one whole shuffle join removed from the pair/keep
    paths; cosines are bit-identical because the pair stage previously
    recomputed the very same V/||V|| normalization)."""
    rows = centroids.select("cell_id", "centroid").collect()
    cells = np.asarray([r["cell_id"] for r in rows], dtype=np.int64)
    C = np.asarray([r["centroid"] for r in rows], dtype=np.float64)
    order = np.argsort(cells)  # ascending -> argmax first-hit = low cell
    cells, C = cells[order], C[order]
    cn = np.linalg.norm(C, axis=1)
    good = cn > 0
    cells, Cn = cells[good], C[good] / cn[good, None]
    schema = f"id {id_type}, cell_id int, cos_centroid double"
    if with_vec:
        schema += ", vn array<double>"
    # bind the budget DRIVER-side into the closure: workers re-import
    # this module, so a bare global read inside gen would see the
    # unpatched default and silently skip chunking under test
    score_doubles = _SCORE_DOUBLES

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.asarray(
                [np.asarray(x, dtype=np.float64) for x in pdf["v"]]
            )
            vn = np.linalg.norm(V, axis=1)
            ok = vn > 0
            if not ok.any():
                continue
            Vn = V[ok] / vn[ok, None]
            nrows = len(Vn)
            cblock = max(1, score_doubles // nrows)
            best = np.full(nrows, -np.inf)
            bestj = np.zeros(nrows, dtype=np.int64)
            rng = np.arange(nrows)
            for s in range(0, len(Cn), cblock):
                S = Vn @ Cn[s : s + cblock].T
                j = S.argmax(axis=1)
                m = S[rng, j]
                upd = m > best  # strict: first block hit wins ties
                best[upd] = m[upd]
                bestj[upd] = j[upd] + s
            out = {
                "id": pdf["id"].values[ok],
                "cell_id": cells[bestj].astype("int32"),
                "cos_centroid": best,
            }
            if with_vec:
                out["vn"] = list(Vn)
            yield pd.DataFrame(out)

    return base.mapInPandas(gen, schema)


def _cell_edges(Vn: np.ndarray, tau: float, block: int):
    """(ea, eb, cos) index triples of the >= tau upper-triangle pairs
    of the cell's normalized vector matrix, computed in row blocks
    (block x cell_size doubles bounds peak memory — a 100k-member
    cell peaks ~800 MB per block, which the cell_sizes() audit exists
    to catch earlier)."""
    n = len(Vn)
    a_out, b_out, c_out = [], [], []
    for s in range(0, n, block):
        S = Vn[s : s + block] @ Vn.T
        rows_idx = np.arange(s, s + S.shape[0])
        upper = np.arange(n)[None, :] > rows_idx[:, None]
        ra, cb = np.nonzero((S >= tau) & upper)
        a_out.append(rows_idx[ra])
        b_out.append(cb)
        c_out.append(S[ra, cb])
    if a_out:
        return (
            np.concatenate(a_out),
            np.concatenate(b_out),
            np.concatenate(c_out),
        )
    z = np.array([], dtype=np.int64)
    return z, z, np.array([], dtype=np.float64)


def _cell_matrix(pdf: pd.DataFrame) -> np.ndarray:
    return np.asarray(
        [np.asarray(x, dtype=np.float64) for x in pdf["vn"]]
    )


def _cell_pairs_arrow(
    keyed: DataFrame,
    tau: float,
    id_type: str,
    block: int = 1024,
) -> DataFrame:
    """Arrow/numpy within-cell pairs over the with_vec assignment
    frame (id, cell_id, vn): applyInPandas per cell computes the
    pairwise cosine matrix in row blocks. ids are sorted so the upper
    triangle gives id_a < id_b. Vectors arrive ALREADY normalized
    from _assign_cells_arrow (the exact V/||V|| this stage used to
    recompute after a join back to the vectors table — same bits,
    one fewer shuffle join)."""
    schema = (
        f"id_a {id_type}, id_b {id_type}, cell_id int, cosine double"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id")
        ids = pdf["id"].values
        Vn = _cell_matrix(pdf)
        cell = int(pdf["cell_id"].iloc[0])
        ea, eb, cos = _cell_edges(Vn, tau, block)
        return pd.DataFrame(
            {
                "id_a": ids[ea],
                "id_b": ids[eb],
                "cell_id": np.full(len(ea), cell, dtype=np.int32),
                "cosine": cos,
            }
        )

    return _cell_grouped(keyed).applyInPandas(fn, schema)


def _cell_grouped(keyed: DataFrame):
    """groupBy(cell_id) over a cell_id repartition whose width is
    derived from the input size (tuning module): the explicit
    repartition satisfies the groupBy's required distribution, so the
    plan still has exactly ONE exchange, but its reduce side — and
    therefore the number of Python-worker tasks the applyInPandas
    stage launches — scales with the data instead of the session's
    fixed shuffle-partition constant (identity at cluster scale)."""
    from data_quality_checker_spark.tuning import scaled_partitions

    n = scaled_partitions(keyed)
    return keyed.repartition(n, "cell_id").groupBy("cell_id")


def _min_label_components(n: int, ea: np.ndarray, eb: np.ndarray):
    """Min-label propagation with pointer jumping over edge index
    arrays — the numpy twin of dedup.duplicate_clusters' distributed
    loop, run per cell (pairs are strictly within-cell, so components
    can never span cells; computing them inside the cell task removes
    the driver-sequenced propagation rounds entirely). Labels are row
    INDICES; rows are sorted by id by the caller, so the min index of
    a component is its min id."""
    lab = np.arange(n, dtype=np.int64)
    if not len(ea):
        return lab
    src = np.concatenate([ea, eb])
    dst = np.concatenate([eb, ea])
    while True:
        new = lab.copy()
        np.minimum.at(new, src, lab[dst])
        new = np.minimum(new, new[new])  # pointer jumping
        if np.array_equal(new, lab):
            return lab
        lab = new


def _cell_components_arrow(
    keyed: DataFrame,
    tau: float,
    id_type: str,
    block: int = 1024,
    mode: str = "components",
    keep: str = "low",
) -> DataFrame:
    """Fused within-cell pair generation + connected components (+
    keep rule) in ONE applyInPandas stage over the with_vec
    assignment frame (id, cell_id, cos_centroid, vn).

    ``mode='components'`` emits (id, cluster_id = min id of the
    component) for every row that appears in at least one >= tau pair
    — exactly duplicate_clusters(pairs) rows. ``mode='losers'`` emits
    the ids semantic_dedup would drop: every component member except
    the keeper (keep='low': lowest (cos_centroid, id); keep='min_id':
    the min id = the component label itself). Identical semantics to
    the pairs -> duplicate_clusters -> members/keepers/losers chain,
    with zero iterative driver rounds, zero persisted frames and zero
    extra shuffles (round-7; see OPTIMIZATION_r07.md)."""
    if mode == "components":
        schema = f"id {id_type}, cluster_id {id_type}"
    else:
        schema = f"id {id_type}"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id")
        ids = pdf["id"].values
        Vn = _cell_matrix(pdf)
        ea, eb, _ = _cell_edges(Vn, tau, block)
        lab = _min_label_components(len(ids), ea, eb)
        mem = np.unique(np.concatenate([ea, eb]))
        if mode == "components":
            return pd.DataFrame(
                {"id": ids[mem], "cluster_id": ids[lab[mem]]}
            )
        if keep == "min_id":
            losers = mem[lab[mem] != mem]
            return pd.DataFrame({"id": ids[losers]})
        dfm = pd.DataFrame(
            {
                "root": lab[mem],
                "cos": pdf["cos_centroid"].values[mem],
                "id": ids[mem],
            }
        )
        # stable sort by (root, cos, id): the first row per root is
        # the keeper — the same (cos_centroid, id) struct-min the
        # relational path takes with F.min_by
        dfm = dfm.sort_values(
            ["root", "cos", "id"], kind="mergesort"
        )
        return pd.DataFrame({"id": dfm[dfm.duplicated("root")]["id"]})

    return _cell_grouped(keyed).applyInPandas(fn, schema)


def _clean(
    df: DataFrame, id_col: str, vec_col: str, dim: int | None = None
) -> DataFrame:
    """(id, v) with NULL/empty vectors dropped — cosine over a NULL or
    zero-length array is NULL and would silently fall out of argmax.
    With ``dim`` set, vectors of any OTHER width are excluded too —
    a mixed-width corpus has no meaningful cosine (zip_with would
    NULL-pad and poison the dot silently)."""
    from data_quality_checker_spark.tuning import parallel_input

    # scan-parallelism floor (tuning module): the dense mapInPandas
    # stages above this would otherwise run as one Python task on a
    # single-row-group vectors table; identity for already-parallel
    # (cached / multi-split) inputs
    base = parallel_input(
        df.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v")
        ).filter(F.col("v").isNotNull())
    )
    if dim:
        return base.filter(F.size("v") == dim)
    return base.filter(F.size("v") > 0)


def seed_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 64,
    dim: int | None = None,
) -> DataFrame:
    """(cell_id int, centroid) — k deterministic seed centroids drawn
    in md5(id) order (hash order is uniform over the corpus and stable
    across retries/engines; LIMIT in partition order is not — the
    same bias the BPE sampler fix removed). cell_id = 0..k-1 in that
    order, so the seed set and numbering are a pure function of the
    input ids. Scale shape: the draw is orderBy(hash).limit(k), which
    Catalyst compiles to TakeOrderedAndProject — a per-partition
    partial top-k merged at the driver, NOT a single-partition global
    sort; the numbering window then runs over only the k survivors
    (bounded, same as the repo's other post-aggregation k-row
    windows)."""
    if k < 1:
        raise ValueError("need k >= 1")
    base = _clean(df, id_col, vec_col, dim)
    # md5 first, id second: the id tiebreak only matters on a
    # (never observed) md5 collision, but keeps ORDER BY total
    topk = (
        base.select(
            F.md5(F.col("id").cast("string")).alias("_h"), "id", "v"
        )
        .orderBy("_h", "id")
        .limit(k)
    )
    w = Window.orderBy("_h", "id")
    return (
        topk.withColumn("_rn", F.row_number().over(w))
        .select(
            (F.col("_rn") - 1).cast("int").alias("cell_id"),
            F.col("v").alias("centroid"),
        )
    )


def assign_cells(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    impl: str = "sql",
) -> DataFrame:
    """(id, cell_id, cos_centroid): each vector's argmax-cosine cell.

    Broadcast NLJ against the k-row centroid table, then ONE hash
    aggregate on id taking max(struct(cosine, -cell_id)) — the struct
    max is the deterministic argmax (highest cosine, then lowest
    cell_id), and partial aggregation means the shuffle carries one
    row per document, not k. Norms are precomputed ONCE per row and
    per centroid, so each (row, centroid) costs one dot fold plus a
    divide instead of three folds (measured 76 s -> 32 s on the
    200k x 256 stage at local[16]; see _dot_fold for why the fold,
    not a flat getItem chain, is the fast dot in this engine).
    ``dim`` optionally pins the vector width (mixed-width rows are
    excluded, not NULLed). ``impl='arrow'`` (requires ``dim``) routes
    the n x k math through batched numpy matmuls instead — the scale
    path; 'sql' stays the engine-portable oracle form."""
    if impl not in _IMPLS:
        raise ValueError(f"impl must be one of {_IMPLS}, got {impl!r}")
    if impl == "arrow":
        if dim is None:
            raise ValueError("impl='arrow' requires dim")
        return _assign_cells_arrow(
            _clean(df, id_col, vec_col, dim),
            centroids,
            _id_type(df, id_col),
        )
    base = _clean(df, id_col, vec_col, dim).withColumn(
        "_n", _norm(F.col("v"))
    )
    cents = centroids.select(
        "cell_id", "centroid", _norm(F.col("centroid")).alias("_cn")
    )
    cos = F.when(
        (F.col("_n") > 0) & (F.col("_cn") > 0),
        _dot_fold(F.col("v"), F.col("centroid"))
        / (F.col("_n") * F.col("_cn")),
    )
    scored = base.join(F.broadcast(cents)).select(
        "id",
        F.struct(
            cos.alias("c"),
            (-F.col("cell_id")).alias("nc"),
        ).alias("_s"),
    )
    best = scored.groupBy("id").agg(F.max("_s").alias("_b"))
    return best.select(
        "id",
        (-F.col("_b.nc")).cast("int").alias("cell_id"),
        F.col("_b.c").alias("cos_centroid"),
    )


def lloyd_refine(
    df: DataFrame,
    centroids: DataFrame,
    dim: int,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """iters rounds of Lloyd refinement over the seed centroids:
    reassign by argmax cosine, recompute each cell's per-dimension
    mean. One broadcast join + one narrow aggregate per round; cells
    that lose every member drop out (k may shrink). ``dim`` is
    required because the mean is computed as dim scalar aggregates —
    the plan-time column form that stays inside whole-stage codegen
    (a posexplode/regroup form would shuffle twice per round)."""
    if iters < 0:
        raise ValueError("need iters >= 0")
    base = _clean(df, id_col, vec_col, dim).withColumn(
        "_n", _norm(F.col("v"))
    )
    for _ in range(iters):
        cents = centroids.select(
            "cell_id", "centroid", _norm(F.col("centroid")).alias("_cn")
        )
        assigned = base.join(F.broadcast(cents)).select(
            "id",
            "v",
            F.struct(
                F.when(
                    (F.col("_n") > 0) & (F.col("_cn") > 0),
                    _dot_fold(F.col("v"), F.col("centroid"))
                    / (F.col("_n") * F.col("_cn")),
                ).alias("c"),
                (-F.col("cell_id")).alias("nc"),
            ).alias("_s"),
        )
        best = (
            assigned.groupBy("id")
            .agg(F.max("_s").alias("_b"), F.first("v").alias("v"))
            .select((-F.col("_b.nc")).cast("int").alias("cell_id"), "v")
        )
        centroids = best.groupBy("cell_id").agg(
            F.array(
                *[F.avg(F.col("v")[i]) for i in range(dim)]
            ).alias("centroid")
        )
    return centroids


def cell_sizes(assignment: DataFrame) -> DataFrame:
    """(cell_id, n_members) — audit the quadratic term before the
    pair join: within-cell candidate volume is sum over cells of
    n_members^2 / 2. A runaway cell means k is too small (or the
    embedding space has a degenerate mode) — fix k, don't salt: the
    pairs inside one cell are genuinely needed."""
    return assignment.groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )


def _resolve_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    lloyd_iters: int,
    dim: int | None,
) -> DataFrame:
    cents = seed_centroids(df, id_col, vec_col, k, dim)
    if lloyd_iters > 0:
        if dim is None:
            raise ValueError("lloyd_iters > 0 requires dim")
        cents = lloyd_refine(df, cents, dim, lloyd_iters, id_col, vec_col)
    return cents


def _cell_pairs(
    assign: DataFrame,
    vecs: DataFrame,
    tau: float,
    impl: str = "sql",
    id_type: str = "bigint",
) -> DataFrame:
    """(id_a, id_b, cell_id, cosine >= tau), id_a < id_b, candidates
    restricted to same-cell members — the SemDeDup bound. Each row's
    norm is computed ONCE in the keyed projection, so per-pair work
    inside the cell self-join is one dot fold + a divide (a naive
    cosine per pair costs three folds). The arrow branch consumes the
    with_vec assignment frame directly (``vecs`` unused — the
    normalized vectors ride the assignment, no join back)."""
    if impl == "arrow":
        return _cell_pairs_arrow(
            assign.select("id", "cell_id", "vn"), tau, id_type
        )
    keyed = (
        assign.join(vecs, "id")
        .select("id", "cell_id", "v")
        .withColumn("nrm", _norm(F.col("v")))
    )
    a = keyed.select(
        F.col("id").alias("id_a"),
        "cell_id",
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = keyed.select(
        F.col("id").alias("id_b"),
        "cell_id",
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cos = F.when(
        (F.col("na") > 0) & (F.col("nb") > 0),
        _dot_fold(F.col("va"), F.col("vb"))
        / (F.col("na") * F.col("nb")),
    )
    return (
        a.join(b, "cell_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "cell_id", cos.alias("cosine"))
        .filter(F.col("cosine") >= tau)
    )


def semantic_dedup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 64,
    tau: float = 0.95,
    lloyd_iters: int = 0,
    dim: int | None = None,
    impl: str = "sql",
) -> DataFrame:
    """(id_a, id_b, cell_id, cosine) semantic-duplicate pairs at
    cosine >= tau; see module docstring for the plan shape. ``dim``
    optionally pins the vector width (mixed-width rows excluded) and
    is required for lloyd_iters > 0 and impl='arrow'. impl:
    'sql' (default) = engine-portable relational math, the form the
    DuckDB oracle twin pins; 'arrow' = batched numpy matmuls for the
    assignment and within-cell pair stages — the scale path (the
    dense-math stages dominate e2e wall at corpus size)."""
    if not 0.0 < tau <= 1.0:
        raise ValueError("need 0 < tau <= 1")
    if impl not in _IMPLS:
        raise ValueError(f"impl must be one of {_IMPLS}, got {impl!r}")
    if impl == "arrow" and dim is None:
        raise ValueError("impl='arrow' requires dim")
    cents = _resolve_centroids(df, id_col, vec_col, k, lloyd_iters, dim)
    if impl == "arrow":
        # with_vec assignment: normalized vectors ride the mapInPandas
        # output, the pair stage consumes it ONCE — no persist, no
        # join back to the vectors table (round-7: one shuffle join
        # and one cache materialization removed)
        assign = _assign_cells_arrow(
            _clean(df, id_col, vec_col, dim),
            cents,
            _id_type(df, id_col),
            with_vec=True,
        )
        out = _cell_pairs_arrow(
            assign.select("id", "cell_id", "vn"),
            tau,
            _id_type(df, id_col),
        )
        out._cached_deps = ()
        return out
    # persisted: the sql pair stage's a/b self-join would otherwise
    # run the O(n*k) assignment subtree twice (Spark does not share
    # common subplans). Travels on _cached_deps for release_cache.
    assign = assign_cells(df, cents, id_col, vec_col, dim, impl).persist()
    out = _cell_pairs(
        assign,
        _clean(df, id_col, vec_col, dim),
        tau,
        impl,
        _id_type(df, id_col),
    )
    out._cached_deps = (assign,)
    return out


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 64,
    tau: float = 0.95,
    lloyd_iters: int = 0,
    dim: int | None = None,
    keep: str = "low",
    impl: str = "sql",
) -> DataFrame:
    """Drop semantic duplicates: one representative per duplicate
    component (connected components over the tau-pairs via the shared
    min-label propagation). ``keep='low'`` retains the member with
    the LOWEST cosine to its cell centroid (the paper's measured-best
    rule — keeps the least redundant example), tie-broken by min id;
    ``keep='min_id'`` is the pure-relational rule the lexical dedup
    endpoints use. Rows in no pair pass through untouched; returns
    ``df`` minus the dropped rows (never touches other columns).
    ``impl='arrow'`` (requires dim) = numpy-matmul dense stages, the
    corpus-scale path; see semantic_dedup_pairs."""
    if not 0.0 < tau <= 1.0:
        raise ValueError("need 0 < tau <= 1")
    if keep not in ("low", "min_id"):
        raise ValueError(f"keep must be 'low' or 'min_id', got {keep!r}")
    if impl not in _IMPLS:
        raise ValueError(f"impl must be one of {_IMPLS}, got {impl!r}")
    if impl == "arrow" and dim is None:
        raise ValueError("impl='arrow' requires dim")
    cents = _resolve_centroids(df, id_col, vec_col, k, lloyd_iters, dim)
    if impl == "arrow":
        # FUSED scale path (round-7): pairs are strictly within-cell
        # (assignment is argmax — one cell per id), so the connected
        # components and the keep rule both live inside the cell task.
        # One mapInPandas (assignment, normalized vectors riding
        # along) -> one applyInPandas (pairs + components + keeper
        # per component, emitting loser ids only) -> one anti-join.
        # Replaces: assignment persist + vectors join + pair stage +
        # the iterative duplicate_clusters driver loop (localCheckpoint
        # + convergence count per round) + members/keepers/losers
        # joins. Identical keep set: same cosines (bit-identical
        # normalization), same components (min-label propagation twin),
        # same (cos_centroid, id) struct-min keeper.
        assign_v = _assign_cells_arrow(
            _clean(df, id_col, vec_col, dim),
            cents,
            _id_type(df, id_col),
            with_vec=True,
        )
        losers = _cell_components_arrow(
            assign_v,
            tau,
            _id_type(df, id_col),
            mode="losers",
            keep=keep,
        ).withColumnRenamed("id", id_col)
        out = df.join(losers, id_col, "left_anti")
        out._cached_deps = ()
        return out
    # persisted: the assignment subtree is consumed FOUR times here —
    # the pair stage's a/b self-join, the members join, and (through
    # members) the keepers aggregate; without the persist each
    # consumer re-executes the O(n*k) broadcast/matmul stage
    assign = assign_cells(df, cents, id_col, vec_col, dim, impl).persist()
    pairs = _cell_pairs(
        assign,
        _clean(df, id_col, vec_col, dim),
        tau,
        impl,
        _id_type(df, id_col),
    )
    try:
        comps = duplicate_clusters(pairs)  # (id, cluster_id = min id)
    except Exception:
        # clustering runs eagerly and has already materialized the
        # assignment cache by the time it can raise (non-convergence,
        # job failure) — without this the cache would outlive the
        # exception for the rest of the session
        assign.unpersist()
        raise
    members = comps.join(assign.select("id", "cos_centroid"), "id")
    if keep == "low":
        keeper_key = F.struct(
            F.col("cos_centroid").alias("c"), F.col("id").alias("i")
        )
    else:
        keeper_key = F.struct(F.col("id").alias("c"), F.col("id").alias("i"))
    keepers = members.groupBy("cluster_id").agg(
        F.min_by("id", keeper_key).alias("_keep")
    )
    losers = (
        members.join(keepers, "cluster_id")
        .filter(F.col("id") != F.col("_keep"))
        .select(F.col("id").alias(id_col))
    )
    out = df.join(losers, id_col, "left_anti")
    # the assignment cache and the clustering's final label
    # checkpoint both feed the anti-join lazily — release via
    # dedup.release_cache(out) once consumed
    out._cached_deps = (assign,) + tuple(
        getattr(comps, "_cached_deps", ())
    )
    return out
