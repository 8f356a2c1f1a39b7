"""Deduplication operators for web-scale corpora.

Replaces the reference's O(n^2) SequenceMatcher all-pairs loop
(nlp_analyzer.py:720-743) with scale-appropriate strategies:

 - exact: hash-groupBy (md5 of text) — one shuffle on a 16-byte key
 - MinHash + banded LSH: shingle -> signature -> band bucket equi-join,
   exact-Jaccard verification on candidates only
 - SimHash: 64-bit fingerprint, 16-bit chunk blocking, hamming verify
   via xor + bit_count
 - n-gram Jaccard: exact verification primitive (used post-LSH)
 - embedding cosine: sign-LSH (random hyperplanes) bucket join + cosine
   verify

All joins are equi-joins on small keys, so AQE handles skew; nothing
ever materializes the n^2 pair space."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_quality_checker_spark.functions.hashing import jaccard, shingles
from data_quality_checker_spark.functions.litfast import lit_double_array

# NOTE: functions/hashing.py also exposes band_keys / minhash_signature
# / simhash64 as small-scale pure-expression forms; this
# module deliberately re-expresses them as explode+aggregate plans (see
# the CollapseProject notes below) and must keep the band-key FORMAT
# ('b{i}:' + md5(concat_ws(','))) byte-identical with hashing.band_keys
# for the portable oracle family.

__all__ = [
    "exact_duplicates",
    "exact_duplicate_groups",
    "release_cache",
    "near_duplicates_minhash",
    "duplicate_clusters",
    "drop_near_duplicates",
    "simhash64_agg",
    "near_duplicates_simhash",
    "ngram_jaccard_pairs",
    "cosine_expr",
    "embedding_near_duplicates",
    "dedup_lines_corpus",
    "duplicate_spans",
]


def exact_duplicate_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of byte-identical documents: (text_md5, n_docs, doc_ids).
    md5 is portable across engines; xxhash64 is the faster JVM-only
    alternative for production."""
    return (
        df.filter(F.col(text_col).isNotNull())
        .groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Every row that participates in an exact-dup group (keep=False
    style, dq_checker.py:559-577 over text)."""
    counts = (
        df.filter(F.col(text_col).isNotNull())
        .groupBy(F.md5(F.col(text_col)).alias("_h"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
    )
    return (
        df.withColumn("_h", F.md5(F.col(text_col)))
        .join(counts, "_h", "semi")
        .drop("_h")
    )


class _CheckpointHandle:
    """Release handle for localCheckpoint storage. DataFrame.unpersist
    is a NO-OP on checkpoint RDDs (probed live), so superseded
    checkpoints are freed by id through SparkContext's persistent-RDD
    registry; duck-types unpersist() so release_cache treats it like
    any cached dep. Freeing a checkpoint makes it UNRECOVERABLE (its
    lineage was truncated away) — only release data that is never
    read again."""

    def __init__(self, sc, rdd_ids):
        self._sc = sc
        self._ids = tuple(rdd_ids)

    def unpersist(self, blocking: bool = False) -> None:
        jmap = self._sc._jsc.getPersistentRDDs()
        for i in self._ids:
            if jmap.containsKey(i):
                jmap.get(i).unpersist(bool(blocking))


def release_cache(df: DataFrame) -> None:
    """Unpersist the intermediate DataFrames an operator cached on
    behalf of a returned (lazy) result. Call after the result has been
    fully consumed — in a long-lived session, leaked cached RDDs
    accumulate across calls."""
    for dep in getattr(df, "_cached_deps", ()):
        dep.unpersist()


def _minhash_shingle_plan(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k_shingle: int,
    shingle_mode: str,
) -> DataFrame:
    """[id, sh] shingle table — the sketch's first projection, shared
    verbatim between :func:`near_duplicates_minhash` and the
    incremental index (operators/minhash_index.py) so batch and
    index sketches are bit-identical BY CONSTRUCTION, not by test.

    # tokens materialized in their own projection: word_ngrams slices
    # per index, so an inlined tokenize would re-run per n-gram.
    # NO array_distinct here: min() is idempotent over duplicate
    # shingles, and distinct is an O(n^2) interpreted pass per doc
    # (the verify step's jaccard() dedups internally where it matters).
    # The token array is BOUND ONCE as a higher-order-function lambda
    # variable (functions/text.bind_once — the registrable_domain
    # pattern). A separate `select(tokens alias _tk).select(...)`
    # projection does NOT protect against re-tokenization: the
    # optimizer collapses the projects and inlines the tokenize
    # subtree into every lambda invocation — O(n_tokens^2) splits per
    # doc, observed live as a wedged 1M-doc run once the corpus
    # carried 5,200-word documents (executor stacks all inside
    # StringSplit/Lower under SimpleHigherOrderFunction)."""
    from data_quality_checker_spark.functions.text import bind_once, tokens

    def _ngrams_bound(tk: Column) -> Column:
        def _one(i: Column) -> Column:
            g = F.concat_ws(" ", F.slice(tk, i + 1, k_shingle))
            return F.xxhash64(g) if shingle_mode == "hash" else g

        empty_t = (
            "array<bigint>" if shingle_mode == "hash" else "array<string>"
        )
        return F.when(
            F.size(tk) >= k_shingle,
            F.transform(
                F.sequence(F.lit(0), F.size(tk) - k_shingle), _one
            ),
        ).otherwise(F.array().cast(empty_t))

    from data_quality_checker_spark.tuning import parallel_input

    sh_expr = bind_once(tokens(text_col), _ngrams_bound)
    # scan-parallelism floor (tuning module): a single-row-group input
    # would otherwise run the whole tokenize+shingle+hash map side in
    # ONE task; identity when the input already has enough partitions
    return (
        parallel_input(df.filter(F.col(text_col).isNotNull()))
        .select(F.col(id_col).alias("id"), sh_expr.alias("sh"))
        .filter(F.size("sh") > 0)
    )


def _minhash_signature_plan(
    base: DataFrame,
    num_hashes: int,
    shingle_mode: str,
    one_permutation: bool = False,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """[id, h0..h{num_hashes-1}] signature table over a shingle table.

    Signature via explode + min-aggregation rather than nested
    array_min(transform(...)) expressions: Catalyst's CollapseProject
    re-inlines the (expensive) shingle subtree into every lambda site,
    turning the pure-projection form O(n_hashes * n_tokens^2) per doc
    (measured 68s for 500 docs). The agg form is linear; map-side
    combine means the shuffle carries one row per doc.

    ``hash_family='xxhash64'`` (production): component j =
    xxhash64(base_hash, j), base_hash = the 8-byte shingle key.
    ``hash_family='md5'`` (cross-engine twin family, string
    components, lexicographic min — the functions/hashing.
    minhash_signature_md5 formula md5('{j}|' || shingle) in
    explode+agg form): requires shingle_mode='text' so the md5 runs
    over the raw shingle string DuckDB/Trino can reproduce."""
    if hash_family not in ("xxhash64", "md5"):
        raise ValueError(
            f"hash_family must be 'xxhash64' or 'md5', got {hash_family!r}"
        )
    if hash_family == "md5":
        if shingle_mode != "text" or one_permutation:
            raise ValueError(
                "hash_family='md5' requires shingle_mode='text' and "
                "one_permutation=False: the md5 family exists to be "
                "byte-reproducible cross-engine over raw shingle strings"
            )
        hashed = base.select("id", F.explode("sh").alias("s")).select(
            "id",
            *[
                F.md5(F.concat(F.lit(f"{j}|"), F.col("s"))).alias(f"h{j}")
                for j in range(num_hashes)
            ],
        )
        return hashed.groupBy("id").agg(
            *[F.min(f"h{j}").alias(f"h{j}") for j in range(num_hashes)]
        )
    _bh = F.col("s") if shingle_mode == "hash" else F.xxhash64("s")
    if one_permutation:
        # OPH: one hash per shingle, binned by value; component j =
        # min hash in bin j; empty bins densified from the global min.
        # Of three measured formulations (536k kept v2 docs, local[32])
        # this conditional-aggregate form is the best OPH:
        #   num_hashes=32:  classic 40.7s | this 38.6s | 2-level 49.1s
        #   num_hashes=128: classic 63.3s | this 83.4s | 2-level 104.0s
        # (2-level = min per (id,bin) then assemble — its (id,bin)
        # shuffle has num_hashes x the groups and loses everywhere.)
        # See near_duplicates_minhash's honest-measurement note: in
        # THIS engine classic's k plain xxhash64 calls are nearly free
        # inside whole-stage codegen, so OPH's literature k-x sketch
        # win does not transfer; keep classic unless profiling says
        # otherwise.
        raw = base.select("id", F.explode("sh").alias("s")).select(
            "id",
            _bh.alias("_h"),
            # bin computed ONCE in the projection, not per-aggregate
            F.pmod(_bh, F.lit(num_hashes)).cast("int").alias("_bin"),
        )
        binned = raw.groupBy("id").agg(
            *[
                F.min(F.when(F.col("_bin") == j, F.col("_h"))).alias(
                    f"h{j}"
                )
                for j in range(num_hashes)
            ],
            F.min("_h").alias("_gmin"),
        )
        return binned.select(
            "id",
            *[
                F.coalesce(
                    F.col(f"h{j}"),
                    F.xxhash64(F.col("_gmin").cast("string"), F.lit(j)),
                ).alias(f"h{j}")
                for j in range(num_hashes)
            ],
        )
    hashed = (
        base.select("id", F.explode("sh").alias("s"))
        # hash the shingle to 8 bytes ONCE, derive the k
        # components from the long (constant work per component
        # instead of re-hashing the string k times — ~1.5x on
        # the sketch phase, measured)
        .select("id", _bh.alias("_bh"))
        # selectExpr ships the whole k-column projection in ONE py4j
        # call (round-7: the per-Column form cost ~3 driver round
        # trips per component per query construction)
        .selectExpr(
            "id",
            *[f"xxhash64(_bh, {j}) as h{j}" for j in range(num_hashes)],
        )
    )
    return hashed.groupBy("id").agg(
        *[F.expr(f"min(h{j}) as h{j}") for j in range(num_hashes)]
    )


def _minhash_band_key_array(num_bands: int, rows_per_band: int) -> Column:
    """array<string> of LSH band keys over h{j} signature COLUMNS —
    format byte-identical with functions/hashing.band_keys
    ('b{i}:' + md5(concat_ws(','))) for the portable oracle family;
    works for both hash families (cast of a string is the identity).
    One parsed expression (round-7) — the per-Column form cost
    ~6 py4j round-trips per band per query construction."""
    bands = []
    for b in range(num_bands):
        cols = ",".join(
            f"cast(h{b * rows_per_band + r} as string)"
            for r in range(rows_per_band)
        )
        bands.append(f"concat('b{b}:', md5(concat_ws(',', {cols})))")
    return F.expr("array(" + ",".join(bands) + ")")


def near_duplicates_minhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    num_hashes: int = 32,
    num_bands: int = 8,
    threshold: float = 0.7,
    storage_path: str | None = None,
    prefilter_margin: float | None = None,
    one_permutation: bool = False,
    shingle_mode: str = "hash",
) -> DataFrame:
    """Near-duplicate pairs (id_a, id_b, jaccard >= threshold).

    ``shingle_mode='hash'`` (default, the crawl-scale form) carries
    each shingle as its xxhash64 LONG from the first projection on:
    the materialized shingle table is ~10x smaller, the exact-verify
    join ships long arrays instead of strings, and set ops compare
    8-byte values — measured 5.8 s -> 4.7 s (-19%) on interleaved
    warm sf0.1 runs at local[32] with identical pairs found, and the
    verify-payload shrink is the lever that grows with candidate
    volume (23M candidate pairs at the 1M-doc sustained bench ship
    ~10x fewer bytes). The exact
    Jaccard is then over hashed shingles: equal up to a 64-bit
    collision (the same accepted trade as dedup_lines_corpus
    ``key_mode='xxhash64'``). ``shingle_mode='text'`` keeps raw
    shingle strings for byte-exact verification (the engine-portable
    oracle form). SIGNATURES ARE IDENTICAL IN BOTH MODES: component
    j is xxhash64(base_hash, j) where base_hash = xxhash64(shingle) —
    hashing the 8-byte base once per component instead of re-hashing
    the shingle STRING num_hashes times is itself ~1.5x on the sketch
    phase, and banding/recall behavior cannot depend on the mode.

    Default banding 8x4 (32 hashes): candidate probability j^4 per
    band keeps false candidates rare even on low-diversity corpora
    (recall at j=0.8 is 1-(1-0.41)^8 ~= 0.985), where 2-row bands
    admit j^2 collisions and flood the verify join.

    Plan shape: one projection (shingles+signature+band keys) -> explode
    bands -> self equi-join on band key -> distinct candidate pairs ->
    ESTIMATED-Jaccard pre-filter on the signature table -> join shingle
    arrays back -> exact Jaccard filter. Candidates scale with
    collisions, never with n^2.

    The pre-filter (``prefilter_margin``, default None = off): the
    MinHash estimator ``matching signature components / num_hashes``
    is computable from the already-materialized signature table, so
    candidates with estimate < threshold - margin can be dropped
    before the shingle arrays are joined. This is a recall trade at
    the margin: a TRUE pair at exactly j = threshold loses
    ~Binom(num_hashes, j) lower-tail mass below the bar (~3% at 32
    hashes / margin 0.15) — the same order as banded LSH's own miss
    rate. HONEST MEASUREMENT, mode-dependent: with STRING shingles
    (round 3, shingle_mode='text') the verify payload dominated and
    the pre-filter cut the 1M-doc sustained run 433 s -> 231 s
    (-47%, identical pairs). With the HASHED-shingle default the
    verify payload is ~10x smaller and the pre-filter's own two
    num_hashes-long signature joins cost more than they save on the
    same corpus and banding (8x4 keeps false candidates rare by
    design): 213 s OFF vs 253-297 s ON across three 1M-doc legs.
    Hence default None under shingle_mode='hash'; pass ~0.15 for
    shingle_mode='text' or low-band configs where false candidates
    flood the verify join.

    ``one_permutation``: One-Permutation Hashing (Li, Owen, Zhang,
    NIPS 2012) — ONE xxhash64 per shingle, partitioned into
    ``num_hashes`` bins by hash value, signature component j = min hash
    landing in bin j. Empty bins (probability (1-1/k)^n_shingles —
    rare for real documents, material only below ~2-3x num_hashes
    shingles) are densified deterministically from the set's global
    minimum hash, so two sets sharing their min (probability = their
    Jaccard) agree on every filled bin. The signature is a DIFFERENT
    estimator with the same expectation: banding recall at the margin
    shifts slightly (gated in tests), while pair PRECISION is
    untouched — the exact-Jaccard verify join back-stops every
    candidate either way.

    HONEST MEASUREMENT (536k kept v2 docs, local[32]): OPH's
    literature pitch — k-fold sketch speedup from hashing each
    shingle once instead of k times — does NOT transfer to this
    engine. At 32 hashes OPH is ~5% faster (38.6s vs 40.7s); at 128
    it is 32% SLOWER (83.4s vs 63.3s): classic's k plain xxhash64
    calls run inside whole-stage codegen at near-memory speed, while
    OPH's k conditional min(when(bin==j)) aggregate updates cost more
    per row than the hashes they avoid. The sketch phase here is
    aggregation/shuffle-bound, not hash-bound — OPH pays off in
    row-at-a-time engines where each hash is function-call-priced.
    Kept as an option (the estimator is value-pinned cross-engine by
    the ``minhash_oph_portable`` oracle and recall-gated in tests),
    exposed as ``PipelineConfig(near_dedup_oph=True)``; default False
    — classic is also what the portable DuckDB-twin oracles pin.

    The shingle and signature intermediates are consumed 2-4x (self-join
    branches + the two verify joins; exchange reuse only covers shuffle
    boundaries, not map-only subtrees). ``storage_path`` chooses the
    materialization: when set, they are WRITTEN as parquet tables
    (``<path>/shingles``, ``<path>/signatures``) and read back — the
    petabyte-scale form: resumable, inspectable, zero executor-memory
    footprint, and nothing stays cached in a long-lived session. When
    None they are persist()ed in memory; call :func:`release_cache` on
    the returned DataFrame once consumed."""
    if num_hashes % num_bands != 0:
        raise ValueError(
            f"num_hashes={num_hashes} must be divisible by "
            f"num_bands={num_bands}: truncation would silently drop "
            f"the trailing hash components from banding and break the "
            f"documented recall math"
        )
    if shingle_mode not in ("hash", "text"):
        raise ValueError(
            f"shingle_mode must be 'hash' or 'text', got {shingle_mode!r}"
        )
    rows_per_band = num_hashes // num_bands
    spark = df.sparkSession
    cached: list[DataFrame] = []

    def materialize(d: DataFrame, name: str) -> DataFrame:
        if storage_path is not None:
            path = f"{storage_path}/{name}"
            d.write.mode("overwrite").parquet(path)
            return spark.read.parquet(path)
        d = d.persist()
        cached.append(d)
        return d

    # sketch construction lives in _minhash_shingle_plan /
    # _minhash_signature_plan / _minhash_band_key_array — shared with
    # the incremental index (operators/minhash_index.py) so batch and
    # index sketches can never drift
    from data_quality_checker_spark.tuning import adaptive_coalesce

    shingled = _minhash_shingle_plan(
        df, id_col, text_col, k_shingle, shingle_mode
    )
    base = materialize(shingled, "shingles")
    # reduce-side width derived from the corpus size (tuning module):
    # identity at cluster scale, collapses tiny reduce stages locally
    sig_plan = adaptive_coalesce(
        _minhash_signature_plan(
            base, num_hashes, shingle_mode, one_permutation
        ),
        df,
    )
    # tiny (num_hashes longs per doc); joined twice
    sig = materialize(sig_plan, "signatures")
    exploded = sig.select(
        "id",
        F.explode(
            _minhash_band_key_array(num_bands, rows_per_band)
        ).alias("bk"),
    )
    cands = adaptive_coalesce(
        exploded.alias("a")
        .join(exploded.alias("b"), "bk")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .distinct(),
        df,
    )
    if prefilter_margin is not None and threshold - prefilter_margin > 0:
        est_bar = threshold - prefilter_margin
        sig_a = sig.select(
            F.col("id").alias("id_a"),
            *[F.col(f"h{j}").alias(f"_ha{j}") for j in range(num_hashes)],
        )
        sig_b = sig.select(
            F.col("id").alias("id_b"),
            *[F.col(f"h{j}").alias(f"_hb{j}") for j in range(num_hashes)],
        )
        est_matches = sum(
            (F.col(f"_ha{j}") == F.col(f"_hb{j}")).cast("int")
            for j in range(num_hashes)
        )
        cands = (
            cands.join(sig_a, "id_a")
            .join(sig_b, "id_b")
            .filter(est_matches / num_hashes >= F.lit(est_bar))
            .select("id_a", "id_b")
        )
    sh_only = base.select("id", "sh")
    verified = (
        cands.join(sh_only.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh_only.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    verified._cached_deps = tuple(cached)  # for release_cache()
    return verified


def simhash64_agg(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, sh) SimHash via explode + 64 codegen'd bit-sum aggregates.

    The pure-expression simhash64 runs interpreted zip_with/aggregate
    lambdas (64 adds per token, no codegen); this form hashes each
    token once and lets a hash aggregate do the bit voting — ~5x
    faster and it map-side combines, so the shuffle carries one row
    per doc."""
    from data_quality_checker_spark.functions.text import tokens

    from data_quality_checker_spark.tuning import parallel_input

    # scan-parallelism floor: see _minhash_shingle_plan note
    tok = parallel_input(
        df.filter(F.col(text_col).isNotNull())
    ).select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("t")
    )
    hashed = tok.select("id", F.xxhash64("t").alias("h"))
    # sum the raw bit (0/1) plus one shared token count instead of a
    # (2*bit - 1) per-row rescale in every one of the 64 aggregates:
    # bit vote positive <=> ones*2 > n, the identical boolean
    # (ones - (n - ones) > 0). Round-7: the per-row arithmetic was
    # ~20% of the aggregate stage (0.83 s -> 0.68 s on the sf0.1
    # sketch), and the shuffle row shrinks by nothing (65 vs 64
    # longs) — same map-side combine shape.
    # batched expression construction (round-7): the per-Column form
    # of the 64 vote aggregates + 64-term packing chain cost ~700 py4j
    # round-trips per query construction; F.expr strings parse each in
    # one call with the identical expression tree
    votes = hashed.groupBy("id").agg(
        *[
            F.expr(f"sum(cast(getbit(h, {i}) as bigint)) as b{i}")
            for i in range(64)
        ],
        F.count(F.lit(1)).alias("_n"),
    )
    pow2 = [1 << i for i in range(63)] + [-(1 << 63)]
    # bigint('<min long>') — a bare negative literal would parse as
    # unary minus over an out-of-range positive literal
    terms = " + ".join(
        f"(case when b{i}*2 > _n then bigint('{pow2[i]}') "
        f"else 0L end)"
        for i in range(64)
    )
    return votes.select(F.col("id"), F.expr(terms).alias("sh"))


def near_duplicates_simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    persist: bool = True,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.

    Blocking: any pair within hamming 3 of 64 bits shares at least one
    of the four 16-bit chunks (pigeonhole), so candidates come from
    four equi-joins on (chunk_idx, chunk_value).

    ``persist=True`` (default) caches the sketch table before the
    chunk self-join: the two join branches are NOT covered by exchange
    reuse (measured: 0 ReusedExchange, the 64-vote aggregate executed
    twice — sketch is the dominant cost, 1.7 s of a 2.8 s run at
    sf0.1), so without the cache the corpus is sketched twice. Call
    :func:`release_cache` on the result once consumed; pass
    ``persist=False`` for bounded one-shot gates (the oracle-entry
    convention, matching near_duplicates_minhash's storage contract)."""
    from data_quality_checker_spark.tuning import adaptive_coalesce

    # reduce-side width derived from the corpus size (tuning module):
    # identity at cluster scale, collapses the 256-task sketch/distinct
    # stages to the core count on small inputs
    base = adaptive_coalesce(simhash64_agg(df, id_col, text_col), df)
    cached: tuple[DataFrame, ...] = ()
    if persist:
        base = base.persist()
        cached = (base,)
    chunks = base.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftrightunsigned(F.col("sh"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF).cast("long"))
                        .alias("cv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("id", "sh", "c.ci", "c.cv")
    # hamming computed AT the join and filtered BEFORE the distinct
    # (round-7): a pair can collide in up to 4 chunks, and the
    # pre-filter means the distinct exchange carries only matching
    # pairs (3 narrow columns) instead of every candidate with both
    # 8-byte sketches. distinct-of-filtered == filter-of-distinct for
    # a deterministic function of the pair, so the output is
    # unchanged.
    out = (
        chunks.alias("a")
        .join(chunks.alias("b"), ["ci", "cv"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.sh").bitwiseXOR(F.col("b.sh"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    out = adaptive_coalesce(out, df)
    out._cached_deps = cached  # for release_cache()
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    block_col: Column | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard pairs within blocking groups. Without a
    block column it blocks on identical minhash band (delegating to
    near_duplicates_minhash is usually better); with one (e.g. lang) it
    computes exact Jaccard within blocks — quadratic per block, so
    blocks must be bounded."""
    if block_col is None:
        return near_duplicates_minhash(
            df, id_col, text_col, k_shingle=n, threshold=threshold
        )
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        block_col.alias("blk"),
        shingles(text_col, n).alias("sh"),
    ).filter(F.size("sh") > 0)
    return (
        base.alias("a")
        .join(base.alias("b"), "blk")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            jaccard(F.col("a.sh"), F.col("b.sh")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns, pure Catalyst."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return F.when((na > 0) & (nb > 0), dot / (na * nb))


def _hyperplanes(dim: int, num_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.normal(0, 1, (num_planes, dim)).tolist()


def sign_lsh_key(
    vec: Column, dim: int, num_planes: int = 12, seed: int = 42
) -> Column:
    """Random-hyperplane LSH bucket key (string of sign bits). Planes
    are literal arrays baked into the plan — deterministic, no state."""
    planes = _hyperplanes(dim, num_planes, seed)
    # dim MUST match the vector length: zip_with pads the shorter side
    # with NULLs, the dot product goes NULL, every sign bit falls to
    # '0', and ALL vectors collapse into one bucket — silently
    # degenerating the LSH join to the n^2 cross product it exists to
    # prevent. assert_true turns that into a loud per-row failure.
    guard = F.assert_true(
        F.size(vec) == F.lit(dim),
        F.concat(
            F.lit(f"sign_lsh_key: expected {dim}-dim vector, got "),
            F.size(vec).cast("string"),
        ),
    )
    bits = []
    for p in planes:
        plane = lit_double_array(p)  # one parsed literal, not dim py4j calls
        dot = F.aggregate(
            F.zip_with(vec, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    # guard is NULL when the assertion passes; coalesce keeps the key
    return F.coalesce(guard.cast("string"), F.concat(*bits))


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.95,
    num_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate vectors: sign-LSH bucket equi-join (vectors within
    a tiny angle almost surely share all sign bits) + cosine verify."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        sign_lsh_key(F.col(vec_col), dim, num_planes, seed).alias("bk"),
    )
    return (
        base.alias("a")
        .join(base.alias("b"), "bk")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine_expr(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over near-duplicate pairs -> one row per
    member: (id, cluster_id) with cluster_id = min id in the component.

    This is the dedup ENDPOINT the pair lists feed (keep one document
    per cluster); the reference never clusters — its pair loop stops at
    pairs (nlp_analyzer.py:720-743). Distributed min-label propagation
    WITH per-round pointer jumping: each iteration (a) joins labels
    across the (symmetrized) edge list and takes the per-node min —
    one hop — then (b) compresses paths by replacing each label with
    its label's label (label(label(id))), which halves the remaining
    depth. Hop alone converges in O(component diameter) rounds — fine
    for star-like near-dup graphs (2-4), but CHAIN-shaped components
    (semantic dedup over dense embedding clusters produced diameter
    >20 live) would blow any fixed budget; hop+compress converges in
    O(log diameter), so max_iter=20 covers diameters to ~2^20.
    Lineage MUST be truncated per round with localCheckpoint: the
    compression step self-joins `hopped`, so an un-truncated logical
    plan DOUBLES each round — a 599-chain fixture OOM'd the driver on
    plan stringification alone when a persist-only variant was tried.
    DataFrame.unpersist is a no-op on checkpoint storage, so each
    SUPERSEDED round's checkpoint is freed by RDD id through the
    persistent-RDD registry (_CheckpointHandle; a sustained run had
    left 13 checkpoints resident). The RESULT keeps the final round's
    checkpoint alive — call :func:`release_cache` on it once consumed
    (the `_cached_deps` convention). Iteration stops early when the
    changed count hits zero; if a component still hasn't converged
    the labels would be WRONG, so non-convergence raises rather than
    silently returning split clusters."""
    from data_quality_checker_spark.tuning import adaptive_coalesce

    e = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    )
    edges = adaptive_coalesce(
        e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct(),
        pairs,
    ).persist()
    # persisted: every propagation hop joins edges again; without the
    # persist each iteration re-executes the ENTIRE upstream pairs DAG
    # (the MinHash candidate+verify pipeline when called from
    # with_near_dup_verdict) — up to max_iter recomputations of the
    # most expensive stage
    sc = pairs.sparkSession.sparkContext

    def _ckpt_id(df: DataFrame) -> int:
        # a localCheckpoint'ed DataFrame's analyzed plan IS the
        # LogicalRDD leaf wrapping the registered checkpoint RDD —
        # read its id EXACTLY rather than diffing the global
        # persistent-RDD registry, which would capture (and later
        # force-free) RDDs persisted concurrently by other threads
        # on the same SparkContext. Metadata access only; no RDD
        # compute path.
        return df._jdf.queryExecution().analyzed().rdd().id()

    labels = (
        adaptive_coalesce(
            edges.select(F.col("src").alias("id")).distinct(), pairs
        )
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    cur_ids = {_ckpt_id(labels)}
    changed = 0
    for _ in range(max_iter):
        nbr = (
            edges.join(
                labels.withColumnsRenamed({"id": "src", "label": "_nl"}),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("_nl").alias("_nl"))
        )
        hopped = labels.join(nbr, "id", "left").select(
            "id",
            F.least(
                F.col("label"), F.coalesce("_nl", F.col("label"))
            ).alias("label"),
            # the ROUND-START label: the convergence check must
            # compare against this, not the hopped value — a round
            # whose hop changed labels has not converged even if the
            # compression step agrees with the hop
            F.col("label").alias("_prev"),
        ).persist()
        # persisted: the pointer-jumping compression below self-joins
        # `hopped`, so without this each round executes the edges-join
        # + min-agg hop TWICE; the eager localCheckpoint on new_labels
        # is the last reader, so the cache is released same-round
        # pointer jumping: label <- label(label). Labels are ids of
        # in-component nodes, so the lookup stays within the
        # component and only ever decreases toward its min; each
        # compression halves the remaining chain depth (O(log
        # diameter) rounds total instead of O(diameter)).
        # The PREVIOUS label rides along as _prev so the convergence
        # check below is a narrow scan of the fresh checkpoint instead
        # of a join back to the superseded one (round-7: one shuffle
        # join fewer per round), and the checkpointed frame is
        # coalesced to the adaptive width (round jobs ran one task per
        # session shuffle partition before).
        new_labels = adaptive_coalesce(
            hopped.alias("x")
            .join(
                hopped.select(
                    F.col("id").alias("label"),
                    F.col("label").alias("_ll"),
                ),
                "label",
                "left",
            )
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("_ll", F.col("label"))
                ).alias("label"),
                "_prev",
            ),
            pairs,
        ).localCheckpoint()
        hopped.unpersist()
        changed = new_labels.filter(
            F.col("label") != F.col("_prev")
        ).count()
        # the eager checkpoint materialized new_labels and the changed
        # count was the last reader of the superseded round — free its
        # checkpoint storage now instead of leaking one per round
        _CheckpointHandle(sc, cur_ids).unpersist()
        cur_ids = {_ckpt_id(new_labels)}
        labels = new_labels.select("id", "label")
        if changed == 0:
            break
    # the final labels are checkpoint-materialized, so the edge cache
    # is no longer needed by the result plan
    edges.unpersist()
    if changed != 0:
        _CheckpointHandle(sc, cur_ids).unpersist()
        raise RuntimeError(
            f"duplicate_clusters: label propagation did not converge "
            f"in max_iter={max_iter} hops ({changed} labels still "
            f"changing) — a duplicate component's diameter exceeds "
            f"max_iter; raise max_iter (labels would be wrong, so "
            f"this fails loudly instead of splitting clusters)"
        )
    out = labels.select("id", F.col("label").alias("cluster_id"))
    # release_cache(out) frees the final round's checkpoint once the
    # result is consumed (it is unrecoverable after that — by design)
    out._cached_deps = (_CheckpointHandle(sc, cur_ids),)
    return out


def drop_near_duplicates(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Keep exactly one document per near-dup cluster (the canonical
    member = min id); documents in no pair pass through untouched.
    Anti-join on the non-canonical member set — never touches text."""
    clusters = duplicate_clusters(pairs, id_a, id_b)
    losers = clusters.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    out = df.join(losers, id_col, "left_anti")
    # the anti-join reads the clustering's final label cache lazily —
    # hand its release handle to the caller (release_cache(out))
    out._cached_deps = getattr(clusters, "_cached_deps", ())
    return out


def dedup_lines_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    min_line_chars: int = 1,
    newline: str = "\n",
    key_mode: str = "xxhash64",
) -> DataFrame:
    """Corpus-wide duplicate-LINE removal, C4-style: any line occurring
    ``min_count``-or-more times across the whole corpus is kept only at
    its first occurrence (global order = min ``(id, pos)``) and removed
    everywhere else; documents are reassembled with line order
    preserved. No reference ancestor — training-data extension (the
    boilerplate-line scrub C4 §2.2 applies to crawl text).

    Lines shorter than ``min_line_chars`` never participate (empty
    lines are document structure, not boilerplate).

    Precondition: ``id_col`` is unique per document — reassembly
    groups by it, so two documents sharing an id would be merged into
    one interleaved text (same contract as the pipeline's near-dedup
    stage; dedup on id upstream if unsure).

    Returns the input columns plus ``text_deduped`` (NULL text stays
    NULL; a doc whose every line is removed becomes ''), ``n_lines``
    and ``n_removed`` (0 for NULL text).

    Scale shape: three shuffles, all on scalar-dominated rows —
    (1) the duplicate-line table is a hash aggregate over
    ``(xxhash64(line), id, pos)`` with map-side combine (a
    100M-occurrence boilerplate line partially aggregates per
    partition — no skewed window); (2) the decision join back to the
    exploded lines is keyed on the 8-byte hash and bounded by AQE's
    skew splitting (the duplicate-line table is usually small enough
    that AQE broadcasts it outright); (3) reassembly re-groups by doc
    id. Line text crosses the wire once for the decision join and once
    for reassembly; hashes, never arrays, carry the dedup decision.
    ``key_mode='text'`` keys on the raw line instead of its xxhash64
    (the engine-portable oracle form; the hash form is the scale
    default and differs only on a 64-bit collision)."""
    import re as _re

    txt = F.col(text_col)
    # escape: F.split takes a regex but reassembly emits the literal
    # delimiter — they must agree for any delimiter ('.', '|', ...)
    lines = docs.filter(txt.isNotNull()).select(
        F.col(id_col),
        F.posexplode(
            F.split(txt, _re.escape(newline), -1)
        ).alias("pos", "_line"),
    )
    eligible = F.length("_line") >= min_line_chars
    key = (
        F.xxhash64("_line") if key_mode == "xxhash64" else F.col("_line")
    )
    keyed = lines.withColumn("_h", key)
    dup = (
        keyed.filter(eligible)
        .groupBy("_h")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_first"),
        )
        .filter(F.col("_c") >= min_count)
        .select(
            "_h",
            F.col(f"_first.{id_col}").alias("_cid"),
            F.col("_first.pos").alias("_cpos"),
        )
    )
    joined = keyed.join(dup, "_h", "left").withColumn(
        "_drop",
        F.col("_cid").isNotNull()
        & eligible
        & ~((F.col(id_col) == F.col("_cid")) & (F.col("pos") == F.col("_cpos"))),
    )
    reasm = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("_drop").cast("long")).alias("n_removed"),
        F.concat_ws(
            newline,
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("_drop"),
                            F.struct(F.col("pos"), F.col("_line")),
                        )
                    )
                ),
                lambda x: x["_line"],
            ),
        ).alias("text_deduped"),
    )
    out = docs.join(reasm, id_col, "left")
    return (
        out.withColumn(
            "text_deduped",
            F.when(txt.isNull(), F.lit(None).cast("string")).otherwise(
                F.col("text_deduped")
            ),
        )
        .withColumn("n_lines", F.coalesce(F.col("n_lines"), F.lit(0)))
        .withColumn("n_removed", F.coalesce(F.col("n_removed"), F.lit(0)))
    )


def duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
    stride: int = 10,
    min_count: int = 2,
    key_mode: str = "xxhash64",
    anchor_mode: str = "position",
) -> DataFrame:
    """Exact-substring duplication report — the bounded-window
    approximation of suffix-array dedup (Lee et al. 2022's >=50-token
    exact-substring criterion; no reference ancestor, training-data
    extension). Samples ``window``-token windows, counts each window's
    occurrences CORPUS-WIDE, and reports per document the fraction of
    its tokens covered by windows that occur >= ``min_count`` times
    anywhere (including self-repetition inside one document).

    Returns one row per doc with >= ``window`` tokens:
    ``(id_col, n_tokens, n_windows, dup_windows, dup_token_frac)``
    where dup_token_frac is the union length of the duplicated
    [pos, pos+window) intervals over n_tokens.

    ``anchor_mode`` picks how window starts are sampled, ~1/stride of
    positions either way:

    - ``'position'`` — every ``stride``-th token position. DANGER at
      cross-document granularity: two copies of the same span only
      produce MATCHING windows when their offsets agree mod stride
      (window content is position-relative), so a span planted at
      offsets differing by a non-multiple of stride is missed
      ENTIRELY. Measured on the planted-offset probe
      (tests/test_dedup_similarity.py): recall 0.0 for misaligned
      pairs. Kept for self-repetition profiling and as the simplest
      oracle form.
    - ``'content'`` — content-defined anchors (winnowing/CDC): a
      position p starts a window iff md5(token[p]) falls under the
      1/stride threshold (the repo's portable hash predicate, never
      rand()). Identical content anchors identically AT ANY OFFSET,
      so cross-doc duplicated spans are caught regardless of
      alignment: measured planted recall (window=50, stride=10,
      offsets differing by non-multiples of stride) 0.81 / 0.85 /
      0.89 mean token coverage at span lengths 75 / 128 / 200 vs 0.0
      / 0.0 / 0.0 for position mode; spans at exactly window length
      need an anchor on their first token (~1/stride chance) — the
      probe test pins these. The anchor density is 1/stride IN
      EXPECTATION over token hashes; a pathological corpus whose
      every token anchors degrades to stride=1 cost, never to wrong
      answers. This is the mode to run at crawl scale.

    Both modes miss duplicated runs shorter than ``window`` and edge
    slack around anchors — the documented trade against a true suffix
    array, which has no practical distributed form.

    Plan: one scan -> windows projection -> explode -> hash aggregate
    on the window key (map-side combine; a boilerplate span repeated
    millions of times collapses per partition) -> join back on the
    8-byte key -> per-doc aggregate with an interval-union fold over
    the sorted duplicated positions. No windows over unbounded
    partitions; text never rides the count shuffle in
    ``key_mode='xxhash64'`` (``'text'`` is the engine-portable oracle
    form)."""
    from data_quality_checker_spark.functions.text import tokens

    if anchor_mode not in ("position", "content"):
        raise ValueError(f"unknown anchor_mode: {anchor_mode!r}")
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), tokens(text_col).alias("_tk")
    ).filter(F.size("_tk") >= window)
    if anchor_mode == "position":
        starts = F.sequence(
            F.lit(0), F.size("_tk") - window, F.lit(stride)
        )
    else:
        # content-defined anchors: md5-threshold predicate on the
        # anchor token (engine-portable — the DuckDB twin uses the
        # byte-identical expression)
        thresh = format(int((2**52) / stride), "013x")
        starts = F.filter(
            F.sequence(F.lit(0), F.size("_tk") - window),
            lambda p: F.substring(
                F.md5(F.element_at(F.col("_tk"), p + F.lit(1))), 1, 13
            )
            < F.lit(thresh),
        )
    spans = base.select(
        id_col,
        F.size("_tk").alias("n_tokens"),
        F.explode(starts).alias("pos"),
        F.col("_tk"),
    ).select(
        id_col,
        "n_tokens",
        "pos",
        F.concat_ws(" ", F.slice("_tk", F.col("pos") + 1, window)).alias(
            "_span"
        ),
    )
    key = (
        F.xxhash64("_span") if key_mode == "xxhash64" else F.col("_span")
    )
    keyed = spans.select(id_col, "n_tokens", "pos", key.alias("_k"))
    dup_keys = (
        keyed.groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("_k")
    )
    flagged = keyed.join(dup_keys, "_k", "left_semi")
    if anchor_mode == "position":
        # every eligible doc has the pos=0 window, so the window table
        # itself enumerates the docs — no extra join
        per_doc_windows = keyed.groupBy(id_col).agg(
            F.max("n_tokens").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_windows"),
        )
    else:
        # content anchors can leave a doc with ZERO windows — keep its
        # row (n_windows=0) so the per-doc contract holds
        per_doc_windows = (
            base.select(id_col, F.size("_tk").alias("n_tokens"))
            .join(
                keyed.groupBy(id_col).agg(
                    F.count(F.lit(1)).alias("n_windows")
                ),
                id_col,
                "left",
            )
            .withColumn("n_windows", F.coalesce("n_windows", F.lit(0)))
        )
    # interval-union fold over the sorted duplicated positions:
    # acc = (covered, end); a window starting past the running end
    # contributes its full length, an overlapping one only the delta
    folded = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dup_windows"),
        F.aggregate(
            F.array_sort(F.collect_list("pos")),
            F.struct(
                F.lit(0).cast("long").alias("covered"),
                F.lit(-1).cast("long").alias("end"),
            ),
            lambda acc, p: F.struct(
                F.when(
                    p >= acc["end"],
                    acc["covered"] + F.lit(window),
                )
                .otherwise(
                    acc["covered"] + p + F.lit(window) - acc["end"]
                )
                .alias("covered"),
                (p + F.lit(window)).cast("long").alias("end"),
            ),
            lambda acc: acc["covered"],
        ).alias("_cov"),
    )
    return (
        per_doc_windows.join(folded, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            "n_windows",
            F.coalesce("dup_windows", F.lit(0)).alias("dup_windows"),
            F.round(
                F.coalesce(F.col("_cov"), F.lit(0))
                / F.col("n_tokens"),
                6,
            ).alias("dup_token_frac"),
        )
    )
