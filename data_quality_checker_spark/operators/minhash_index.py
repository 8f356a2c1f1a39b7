"""Incremental MinHash dedup index — the rolling-crawl workflow.

At 100 TB you never re-dedup the corpus from scratch: each crawl
snapshot is sketched ONCE and joined against a persistent index of
everything already ingested. This module persists the three MinHash
sketch tables (shingles, signatures, band keys) as a parquet-addressed
index plus a parameter manifest, and answers "which documents of this
NEW batch duplicate something already in the corpus?" with work
proportional to the new batch — the index is only ever scanned/joined,
never re-sketched.

The reference has no incremental surface at all (its
_find_text_pairs, nlp_analyzer.py:720-743, is an in-memory O(n^2)
SequenceMatcher loop over one DataFrame); this is the scale extension
of the same capability.

Sketch construction is SHARED with operators/dedup.near_duplicates_
minhash (_minhash_shingle_plan / _minhash_signature_plan /
_minhash_band_key_array), so a batch dedup of old ∪ new and an index
query of new-vs-index(old) see bit-identical signatures by
construction — pinned by tests/test_minhash_index.py's cross-parity
gate against the batch operator.

Scale notes (100 TB):
 - build: one sketch pass over the corpus; the three tables are plain
   parquet (resumable, inspectable, zero executor-memory footprint —
   the near_duplicates_minhash storage_path contract made durable).
 - query: the only full-table work is ONE scan of bands/ (ReadSchema-
   pruned to [id, bk]) for the band equi-join and ONE scan of
   shingles/ ([id, sh]) for exact verify. With a small batch the band
   join broadcasts the NEW side (row-count guarded, decontam's
   pattern), so the index side never shuffles there; past the guard it
   is an equi-shuffle on the 40-byte band key. The verify join against
   shingles/ is AQE-sized: a bounded candidate set downgrades it to a
   broadcast (measured at sf0.01: the whole query runs 3 BHJ / 0 SMJ /
   2 Exchanges), and at candidate volumes past the broadcast threshold
   Spark 4's runtime Bloom-filter injection prunes the shingle shuffle
   from the candidate side (the decontam shuffle-path insurance). On
   Iceberg/bucketed storage the bands table would be bucketed by bk to
   make the large-batch case shuffle-free on the index side too — the
   parquet layout here keeps the same schema so that swap is a writer
   change only.
 - append: sketches ONLY the new batch. Appends are STAGED then
   PUBLISHED: the batch's three sketch tables are written to
   ``_staging/<batch_id>/`` (inert — live tables untouched), a begin
   marker lands in the ``_appends/`` ledger, the staged files are
   renamed into the live table dirs under a ``batch-<batch_id>~``
   filename prefix ('~' sits outside the batch-id alphabet, so one
   id's prefix can never cover another's files; rename is the
   cheapest primitive every Hadoop filesystem offers), and a commit
   marker replaces the begin marker.
   A crash anywhere leaves either (a) staging garbage (harmless,
   overwritten on retry) or (b) a begin-without-commit ledger entry —
   which read_minhash_index_meta REFUSES to read past (every
   query/append entrypoint detects the torn batch) and
   repair_minhash_index rolls back by prefix-deleting that batch's
   published files. Re-appending an already-committed ``batch_id`` is
   a no-op, so retries are exactly-once per batch id. On Iceberg the
   three writes would collapse into one snapshot commit; this ledger
   gives plain parquet the same detect/repair/idempotence contract.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_quality_checker_spark.functions.hashing import jaccard
from data_quality_checker_spark.operators.dedup import (
    _minhash_band_key_array,
    _minhash_shingle_plan,
    _minhash_signature_plan,
)

__all__ = [
    "build_minhash_index",
    "append_minhash_index",
    "query_minhash_index",
    "read_minhash_index_meta",
    "compact_minhash_index",
    "filter_batch_against_index",
    "repair_minhash_index",
    "verify_minhash_index",
]

_TABLES = ("shingles", "signatures", "bands")

_FORMAT_VERSION = 1
_META_KEYS = (
    "k_shingle",
    "num_hashes",
    "num_bands",
    "shingle_mode",
    "one_permutation",
    "hash_family",
    "id_type",
)


def _sketch(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k_shingle: int,
    num_hashes: int,
    num_bands: int,
    shingle_mode: str,
    one_permutation: bool,
    hash_family: str,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(shingles [id, sh], signatures [id, h0..], bands [id, bk]) —
    the exact expressions near_duplicates_minhash builds."""
    base = _minhash_shingle_plan(df, id_col, text_col, k_shingle, shingle_mode)
    sig, bands = _derive_sig_bands(
        base, num_hashes, num_bands, shingle_mode, one_permutation,
        hash_family,
    )
    return base, sig, bands


def _bands_of(sig: DataFrame, num_hashes: int, num_bands: int) -> DataFrame:
    """[id, bk] band-key table from a signature table — the ONE place
    this derivation lives, so build/append/query forms cannot drift."""
    return sig.select(
        "id",
        F.explode(
            _minhash_band_key_array(num_bands, num_hashes // num_bands)
        ).alias("bk"),
    )


def _derive_sig_bands(
    base: DataFrame,
    num_hashes: int,
    num_bands: int,
    shingle_mode: str,
    one_permutation: bool,
    hash_family: str,
) -> tuple[DataFrame, DataFrame]:
    """(signatures, bands) from a shingle table (shared derivation)."""
    sig = _minhash_signature_plan(
        base, num_hashes, shingle_mode, one_permutation, hash_family
    )
    return sig, _bands_of(sig, num_hashes, num_bands)


def _validate_params(
    k_shingle: int, num_hashes: int, num_bands: int, shingle_mode: str
) -> None:
    if num_hashes % num_bands != 0:
        raise ValueError(
            f"num_hashes={num_hashes} must be divisible by "
            f"num_bands={num_bands} (see near_duplicates_minhash)"
        )
    if shingle_mode not in ("hash", "text"):
        raise ValueError(
            f"shingle_mode must be 'hash' or 'text', got {shingle_mode!r}"
        )
    if k_shingle < 1:
        raise ValueError(f"k_shingle must be >= 1, got {k_shingle}")


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` — the Hadoop FS API via py4j, so
    marker/rename/delete primitives work on HDFS/S3A/local alike (the
    read_minhash_index_meta portability rationale)."""
    sc = spark.sparkContext
    jpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    return fs, jpath


def _touch(spark: SparkSession, path: str) -> None:
    fs, p = _hadoop_fs(spark, path)
    fs.create(p, True).close()


def _exists(spark: SparkSession, path: str) -> bool:
    fs, p = _hadoop_fs(spark, path)
    return bool(fs.exists(p))


def _delete(spark: SparkSession, path: str) -> None:
    fs, p = _hadoop_fs(spark, path)
    if fs.exists(p):
        fs.delete(p, True)


def _check_batch_id(batch_id: str) -> str:
    # anchored ASCII class — str.isalnum would admit any Unicode
    # letter/digit ("снимок", "①") into object keys and ledger marker
    # names the docstring promises are [A-Za-z0-9._-]
    if not batch_id or not re.fullmatch(r"[A-Za-z0-9._-]+", batch_id):
        raise ValueError(
            f"batch_id must be non-empty [A-Za-z0-9._-], got {batch_id!r}"
        )
    return batch_id


def _uncommitted_batches(spark: SparkSession, path: str) -> list[str]:
    """Ledger batch ids with a begin marker but no commit marker —
    torn appends that need repair_minhash_index."""
    fs, ledger = _hadoop_fs(spark, f"{path}/_appends")
    if not fs.exists(ledger):
        return []
    begun, committed = set(), set()
    for st in fs.listStatus(ledger):
        name = st.getPath().getName()
        if name.endswith(".begin"):
            begun.add(name[: -len(".begin")])
        elif name.endswith(".commit"):
            committed.add(name[: -len(".commit")])
    return sorted(begun - committed)


def _publish_staged_table(
    spark: SparkSession, path: str, batch_id: str, table: str
) -> int:
    """Rename the staged part files of one table into the live table
    dir under the batch-id prefix; returns files moved. Idempotent for
    a re-run after a partial publish: a name collision means the file
    already landed, so the stale staged copy is dropped.

    The '~' separating the id from the part-file name is deliberately
    OUTSIDE the [A-Za-z0-9._-] batch-id alphabet: with '-' (which ids
    may contain) the rollback prefix glob for batch "2024" would also
    match committed files of batch "2024-06" and delete them."""
    fs, src_dir = _hadoop_fs(spark, f"{path}/_staging/{batch_id}/{table}")
    jvm = spark.sparkContext._jvm
    moved = 0
    for st in fs.listStatus(src_dir):
        name = st.getPath().getName()
        if not name.endswith(".parquet"):
            continue  # _SUCCESS etc.
        dst = jvm.org.apache.hadoop.fs.Path(
            f"{path}/{table}/batch-{batch_id}~{name}"
        )
        if fs.exists(dst):
            fs.delete(st.getPath(), False)
            continue
        if not fs.rename(st.getPath(), dst):
            raise IOError(
                f"rename failed publishing {table} of batch "
                f"{batch_id!r} into {path}"
            )
        moved += 1
    return moved


def _rollback_batch(spark: SparkSession, path: str, batch_id: str) -> int:
    """Delete every published file of a batch plus its staging dir
    and begin marker; returns files removed. Matches on the
    ``batch-<id>~`` prefix — '~' is outside the batch-id alphabet, so
    the glob for one id can never swallow another id that extends it
    (the "2024" vs "2024-06" prefix trap). A second, legacy pattern
    covers ``batch-<id>-part-`` files published by pre-'~' builds;
    since every '~'-scheme filename contains a '~' and no legacy name
    does, legacy matches whose tail carries a '~' are SKIPPED. A
    LEGACY file can still belong to a different COMMITTED batch whose
    id extends the torn one (rolling back torn "2024" must not delete
    committed legacy batch "2024-part-1"'s "batch-2024-part-1-part-0"),
    so legacy matches are additionally checked against the ledger's
    commit markers and skipped when any committed id's legacy prefix
    covers the filename (round-7 advisory fix)."""
    jvm = spark.sparkContext._jvm
    # committed ids whose LEGACY filenames a prefix glob could swallow
    fs_l, ledger = _hadoop_fs(spark, f"{path}/_appends")
    committed_prefixes: list[str] = []
    if fs_l.exists(ledger):
        for st in fs_l.listStatus(ledger):
            name = st.getPath().getName()
            if name.endswith(".commit"):
                cid = name[: -len(".commit")]
                if cid != batch_id and cid.startswith(batch_id):
                    committed_prefixes.append(f"batch-{cid}-part-")
    removed = 0
    for table in _TABLES:
        fs, _ = _hadoop_fs(spark, f"{path}/{table}")
        for pat, legacy in (
            (f"{path}/{table}/batch-{batch_id}~*", False),
            (f"{path}/{table}/batch-{batch_id}-part-*", True),
        ):
            glob = jvm.org.apache.hadoop.fs.Path(pat)
            for st in fs.globStatus(glob) or []:
                fname = st.getPath().getName()
                if legacy and "~" in fname:
                    continue  # a '~'-scheme file of ANOTHER batch
                if legacy and any(
                    fname.startswith(p) for p in committed_prefixes
                ):
                    continue  # a committed legacy batch extending this id
                fs.delete(st.getPath(), False)
                removed += 1
    _delete(spark, f"{path}/_staging/{batch_id}")
    _delete(spark, f"{path}/_appends/{batch_id}.begin")
    return removed


def repair_minhash_index(spark: SparkSession, path: str) -> dict:
    """Roll back every torn append (begin marker without commit): the
    batch's published files are prefix-deleted from the live tables,
    its staging dir and begin marker removed. The index returns to its
    last committed state; re-run append_minhash_index with the same
    batch_id to land the batch. Returns
    ``{batch_id: files_removed}``."""
    return {
        bid: _rollback_batch(spark, path, bid)
        for bid in _uncommitted_batches(spark, path)
    }


def verify_minhash_index(spark: SparkSession, path: str) -> dict:
    """Cross-table consistency check: the distinct-id sets of
    shingles/signatures/bands must agree (every committed append moves
    all three in lockstep). Returns per-table distinct-id counts plus
    ``consistent``; raises on uncommitted appends (repair first)."""
    torn = _uncommitted_batches(spark, path)
    if torn:
        raise ValueError(
            f"MinHash index at {path} has uncommitted appends "
            f"{torn} — run repair_minhash_index first"
        )
    counts = {
        t: spark.read.parquet(f"{path}/{t}").select("id").distinct().count()
        for t in _TABLES
    }
    counts["consistent"] = len(set(counts.values())) == 1
    return counts


def read_minhash_index_meta(
    spark: SparkSession, path: str, check_appends: bool = True
) -> dict:
    """The index's parameter manifest (written by build_minhash_index).

    Stored as a single-row JSON dataset under ``<path>/meta`` — written
    through the Spark writer so the index works on any Hadoop
    filesystem (HDFS/S3/local), not just a local driver disk.

    Refuses to read an index with a torn append (begin marker without
    commit in the ``_appends`` ledger, ``check_appends=True`` default):
    every query/append entrypoint goes through here, so a crashed
    append can never silently feed duplicate or partial sketch rows
    into dedup decisions — run repair_minhash_index, then retry the
    append with the same batch_id. (append_minhash_index rolls back
    its OWN torn batch_id before this check, so retrying the crashed
    batch self-heals; a DIFFERENT batch's torn state still fails.)"""
    if check_appends:
        torn = _uncommitted_batches(spark, path)
        if torn:
            raise ValueError(
                f"MinHash index at {path} has uncommitted appends "
                f"{torn} (crashed mid-publish) — run "
                f"repair_minhash_index(spark, path), then re-append "
                f"with the same batch_id"
            )
    try:
        row = spark.read.json(f"{path}/meta").head()
    except Exception as exc:  # noqa: BLE001 — repackage with the path
        raise ValueError(
            f"no MinHash index manifest at {path}/meta — build the "
            f"index with build_minhash_index first ({exc})"
        ) from exc
    if row is None:
        raise ValueError(f"empty MinHash index manifest at {path}/meta")
    meta = row.asDict()
    missing = [k for k in _META_KEYS if k not in meta]
    if missing or meta.get("format_version") != _FORMAT_VERSION:
        raise ValueError(
            f"incompatible MinHash index manifest at {path}/meta: "
            f"missing={missing}, "
            f"format_version={meta.get('format_version')!r} "
            f"(expected {_FORMAT_VERSION})"
        )
    meta["num_hashes"] = int(meta["num_hashes"])
    meta["num_bands"] = int(meta["num_bands"])
    meta["k_shingle"] = int(meta["k_shingle"])
    return meta


def build_minhash_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    num_hashes: int = 32,
    num_bands: int = 8,
    shingle_mode: str = "hash",
    one_permutation: bool = False,
    hash_family: str = "xxhash64",
) -> dict:
    """Sketch ``df`` once and persist the index at ``path``
    (overwrite). Layout: ``meta/`` (1-row JSON manifest), ``shingles/``
    [id, sh], ``signatures/`` [id, h0..h{num_hashes-1}], ``bands/``
    [id, bk]. Returns the manifest dict plus ``n_docs``.

    Ids must be unique per document across the index's whole lifetime
    (build + appends): queries report pairs by id, and duplicate ids
    would conflate distinct documents.

    The sketch parameters are FROZEN into the manifest; query/append
    read them back rather than taking them as arguments, so a
    mismatched re-sketch is impossible by API shape."""
    _validate_params(k_shingle, num_hashes, num_bands, shingle_mode)
    # validate family/mode compatibility before any write happens
    _minhash_signature_plan(
        _minhash_shingle_plan(
            df.limit(0), id_col, text_col, k_shingle, shingle_mode
        ),
        num_hashes, shingle_mode, one_permutation, hash_family,
    )
    spark = df.sparkSession
    id_type = df.schema[id_col].dataType.simpleString()
    base = _minhash_shingle_plan(df, id_col, text_col, k_shingle, shingle_mode)
    # One sketch pass: shingles/ is written from the corpus, then
    # signatures/bands are derived from the WRITTEN shingles (read
    # back) — the corpus text is scanned exactly once, and a resumed
    # build can restart from the shingle table.
    base.write.mode("overwrite").parquet(f"{path}/shingles")
    base_r = spark.read.parquet(f"{path}/shingles")
    sig = _minhash_signature_plan(
        base_r, num_hashes, shingle_mode, one_permutation, hash_family
    )
    sig.write.mode("overwrite").parquet(f"{path}/signatures")
    sig_r = spark.read.parquet(f"{path}/signatures")
    bands = _bands_of(sig_r, num_hashes, num_bands)
    bands.write.mode("overwrite").parquet(f"{path}/bands")
    meta = {
        "format_version": _FORMAT_VERSION,
        "k_shingle": k_shingle,
        "num_hashes": num_hashes,
        "num_bands": num_bands,
        "shingle_mode": shingle_mode,
        "one_permutation": one_permutation,
        "hash_family": hash_family,
        "id_type": id_type,
    }
    # Manifest as a 1-row JSON dataset through the Spark writer: works
    # on any Hadoop filesystem and keeps booleans/ints typed.
    spark.createDataFrame([meta]).coalesce(1).write.mode(
        "overwrite"
    ).json(f"{path}/meta")
    # count over the (already-written) signature table: a zero-column
    # scan of num_hashes*8-byte rows, not a corpus re-read
    n_docs = spark.read.parquet(f"{path}/signatures").count()
    return {**meta, "n_docs": n_docs}


def append_minhash_index(
    new_df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_id: str | None = None,
) -> dict:
    """Sketch ONLY ``new_df`` (with the manifest's frozen parameters)
    and publish its rows into the index tables as ONE repairable unit.
    The caller owns id uniqueness vs what's already indexed —
    appending genuinely-new ids twice under different batch_ids would
    double-count them in every later query.

    ``batch_id`` names the unit in the ``_appends`` ledger (sanitized
    [A-Za-z0-9._-]). Pass a stable id (crawl snapshot name, task
    attempt-independent) to get exactly-once retry semantics: a
    batch_id whose commit marker already exists is a NO-OP (returns
    ``n_appended=0, already_committed=True``), and a batch_id that
    previously crashed mid-publish is rolled back (its published files
    prefix-deleted) and re-landed. With ``batch_id=None`` a fresh
    random id is minted — the append is still torn-proof (detect +
    repair), but a blind retry lands the batch twice.

    Protocol (see the module docstring): stage the three sketch tables
    under ``_staging/<batch_id>/`` (live tables untouched — a crash
    here costs nothing), write ``<batch_id>.begin`` to the ledger,
    rename the staged files into the live dirs under a
    ``batch-<batch_id>~`` prefix, write ``<batch_id>.commit``, drop
    the begin marker and staging dir. read_minhash_index_meta refuses
    to serve an index holding a begin-without-commit entry, so a torn
    publish is caught at the next query/append, and
    repair_minhash_index reverts it by prefix delete.

    Work is proportional to the NEW batch only: one sketch pass writes
    staging; signatures/bands derive from the staged shingles read
    back. The existing index tables are never scanned. Returns the
    manifest plus ``n_appended``."""
    import uuid

    spark = new_df.sparkSession
    if batch_id is None:
        batch_id = uuid.uuid4().hex[:16]
    _check_batch_id(batch_id)
    if _exists(spark, f"{path}/_appends/{batch_id}.commit"):
        meta = read_minhash_index_meta(spark, path)
        return {
            **meta,
            "batch_id": batch_id,
            "n_appended": 0,
            "already_committed": True,
        }
    # a prior attempt of THIS batch may have died mid-publish: roll it
    # back (other batches' torn appends still fail the meta read below)
    if _exists(spark, f"{path}/_appends/{batch_id}.begin"):
        _rollback_batch(spark, path, batch_id)
    meta = read_minhash_index_meta(spark, path)
    _check_id_type(new_df, id_col, meta)

    staging = f"{path}/_staging/{batch_id}"
    base = _minhash_shingle_plan(
        new_df, id_col, text_col, meta["k_shingle"], meta["shingle_mode"]
    )
    # one corpus pass lands staged shingles; derive the rest from the
    # WRITTEN table (the build_minhash_index convention — no persist
    # needed, the re-read replaces it)
    base.write.mode("overwrite").parquet(f"{staging}/shingles")
    base_r = spark.read.parquet(f"{staging}/shingles")
    sig, _ = _derive_sig_bands(
        base_r, meta["num_hashes"], meta["num_bands"],
        meta["shingle_mode"], meta["one_permutation"],
        meta["hash_family"],
    )
    sig.write.mode("overwrite").parquet(f"{staging}/signatures")
    sig_r = spark.read.parquet(f"{staging}/signatures")
    _bands_of(sig_r, meta["num_hashes"], meta["num_bands"]).write.mode(
        "overwrite"
    ).parquet(f"{staging}/bands")
    n_appended = sig_r.count()

    _touch(spark, f"{path}/_appends/{batch_id}.begin")
    for table in _TABLES:
        _publish_staged_table(spark, path, batch_id, table)
    _touch(spark, f"{path}/_appends/{batch_id}.commit")
    _delete(spark, f"{path}/_appends/{batch_id}.begin")
    _delete(spark, staging)
    return {**meta, "batch_id": batch_id, "n_appended": n_appended}


def filter_batch_against_index(
    new_df: DataFrame,
    path: str,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    drop_within_batch: bool = True,
    **query_kwargs,
) -> DataFrame:
    """The operational form of :func:`query_minhash_index`: the batch
    MINUS its duplicates — drop every batch doc that near-duplicates
    an indexed doc and (``drop_within_batch``, default) keep one
    canonical member (min id) per within-batch cluster, via the same
    dedup.drop_near_duplicates rule the batch pipeline uses. The
    survivors are what a rolling-crawl pipeline appends to the index
    and ships downstream. Anti-joins on ids only — never touches
    text. Call dedup.release_cache(result) once consumed.

    Interaction rule when a doc is in BOTH pair kinds: cross drops
    apply first, then within-batch clustering keeps its min-id
    canonical among the batch. A within-cluster whose canonical also
    matched the index loses all its members (the content is already
    in the corpus); a non-canonical member that matched the index
    drops without dragging down its cluster's canonical (near-dup at
    a threshold is not transitive — the canonical earned no direct
    index match)."""
    from data_quality_checker_spark.operators.dedup import (
        drop_near_duplicates,
    )

    if "include_within_batch" in query_kwargs:
        raise TypeError(
            "filter_batch_against_index controls pair kinds via "
            "drop_within_batch, not include_within_batch"
        )
    pairs = query_minhash_index(
        new_df, path, threshold=threshold, id_col=id_col,
        text_col=text_col, include_within_batch=drop_within_batch,
        **query_kwargs,
    )
    cached = list(getattr(pairs, "_cached_deps", ()))
    cross_losers = (
        pairs.filter(F.col("pair_type") == "index-new")
        .select(F.col("id_new").alias(id_col))
        .distinct()
    )
    out = new_df.join(cross_losers, id_col, "left_anti")
    if drop_within_batch:
        within = pairs.filter(F.col("pair_type") == "new-new").select(
            "id_index", "id_new"
        )
        out = drop_near_duplicates(
            out, within, id_col=id_col, id_a="id_index", id_b="id_new"
        )
        cached.extend(getattr(out, "_cached_deps", ()))
    out._cached_deps = tuple(cached)
    return out


def compact_minhash_index(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_mb: int = 256,
) -> dict:
    """Rewrite the index with healthy file sizes after many appends.

    Every append adds a few files per table; a nightly-crawl index
    accumulates thousands of sub-MB parquet files and query scans pay
    per-file open cost (sources/io.compact_parquet has the full
    rationale). Compacts shingles/signatures/bands via compact_parquet
    and re-writes the manifest unchanged. NEVER in-place (a same-path
    rewrite is non-atomic everywhere) — write to ``out_path`` and swap
    directories in the orchestrator; queries running against the old
    path are unaffected until the swap.

    Returns per-table compaction stats keyed by table name."""
    import os as _os

    from data_quality_checker_spark.sources.io import compact_parquet

    # enforce the documented contract (local symlink aliases resolved;
    # URI-addressed paths compare textually)
    same = path.rstrip("/") == out_path.rstrip("/")
    if not same and "://" not in path and "://" not in out_path:
        same = _os.path.realpath(path) == _os.path.realpath(out_path)
    if same:
        raise ValueError(
            "compact_minhash_index never rewrites in-place: out_path "
            "must differ from path (write aside, then swap in the "
            "orchestrator)"
        )
    meta = read_minhash_index_meta(spark, path)
    stats = {
        name: compact_parquet(
            spark, f"{path}/{name}", f"{out_path}/{name}", target_mb
        )
        for name in ("shingles", "signatures", "bands")
    }
    manifest = {k: meta[k] for k in ("format_version", *_META_KEYS)}
    spark.createDataFrame([manifest]).coalesce(1).write.mode(
        "overwrite"
    ).json(f"{out_path}/meta")
    # carry the committed-append ledger forward so a batch_id retried
    # AFTER the compact-and-swap still no-ops instead of re-landing
    # (the meta read above already refused any uncommitted entry)
    fs, ledger = _hadoop_fs(spark, f"{path}/_appends")
    if fs.exists(ledger):
        for st in fs.listStatus(ledger):
            name = st.getPath().getName()
            if name.endswith(".commit"):
                _touch(spark, f"{out_path}/_appends/{name}")
    return stats


def _check_id_type(df: DataFrame, id_col: str, meta: dict) -> None:
    got = df.schema[id_col].dataType.simpleString()
    if got != meta["id_type"]:
        raise ValueError(
            f"id column {id_col!r} has type {got}, index was built "
            f"with {meta['id_type']} — cast upstream so pair ids "
            f"compare exactly"
        )


def query_minhash_index(
    new_df: DataFrame,
    path: str,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    include_within_batch: bool = False,
    broadcast: bool | None = None,
    broadcast_max_rows: int = 250_000,
    persist: bool = True,
) -> DataFrame:
    """Near-duplicate pairs between a NEW batch and the indexed corpus:
    ``(id_index, id_new, jaccard, pair_type)`` with exact-Jaccard
    verification, ``jaccard >= threshold``. Work is proportional to
    the new batch plus its band collisions — the index is joined, not
    re-sketched.

    ``pair_type``: 'index-new' for cross pairs; with
    ``include_within_batch=True`` the batch's INTERNAL near-dup pairs
    are unioned in as 'new-new' (id_index < id_new ordering, same
    sketch — so one call gives the full "what's duplicated about this
    batch" answer without a second operator).

    Rows where the new id equals an indexed id are EXCLUDED from cross
    pairs: a re-crawl of a known document is an ingest/versioning
    event (sources/io snapshot_diff territory), not a near-dup
    discovery.

    Join strategy (the decontam row-count guard): ``broadcast=None``
    hints broadcast of the NEW side's band keys when the batch holds
    at most ``broadcast_max_rows`` sketched docs (~250k docs x
    num_bands 40-byte keys ≈ 80 MB build side) — the index's bands
    table then streams through a broadcast-hash join with NO index
    shuffle. True forces the hint, False forces the shuffle form (AQE
    may still downgrade it). The batch's sketch tables are persist()ed
    (consumed by the band join + verify); call
    dedup.release_cache(result) once consumed. ``persist=False`` skips
    the caching for bounded one-shot gates where recompute is cheaper
    than a leaked cache in a long-lived session (the oracle-entry
    convention) — pass an explicit ``broadcast`` with it or the
    row-count guard will recompute the sketch once for its count."""
    spark = new_df.sparkSession
    meta = read_minhash_index_meta(spark, path)
    _check_id_type(new_df, id_col, meta)
    from data_quality_checker_spark.tuning import adaptive_coalesce

    base, _sig, bands = _sketch(
        new_df, id_col, text_col, meta["k_shingle"], meta["num_hashes"],
        meta["num_bands"], meta["shingle_mode"], meta["one_permutation"],
        meta["hash_family"],
    )
    # reduce widths derived from the batch size (tuning module):
    # identity at scale, core-count reduce stages for small batches
    bands = adaptive_coalesce(bands, new_df)
    cached: list[DataFrame] = []
    if persist:
        base, bands = base.persist(), bands.persist()
        cached = [base, bands]
    new_sh, new_bands = base, bands
    if broadcast is None:
        broadcast = new_sh.count() <= broadcast_max_rows
    nb = F.broadcast(new_bands) if broadcast else new_bands
    idx_bands = spark.read.parquet(f"{path}/bands")
    idx_sh = spark.read.parquet(f"{path}/shingles")

    cand = adaptive_coalesce(
        idx_bands.alias("i")
        .join(nb.alias("n"), "bk")
        .filter(F.col("i.id") != F.col("n.id"))
        .select(
            F.col("i.id").alias("id_index"),
            F.col("n.id").alias("id_new"),
        )
        .distinct(),
        new_df,
    )
    cross = (
        cand.join(
            idx_sh.withColumnsRenamed({"id": "id_index", "sh": "sh_i"}),
            "id_index",
        )
        .join(
            new_sh.withColumnsRenamed({"id": "id_new", "sh": "sh_n"}),
            "id_new",
        )
        .select(
            "id_index",
            "id_new",
            jaccard(F.col("sh_i"), F.col("sh_n")).alias("jaccard"),
            F.lit("index-new").alias("pair_type"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_index", "id_new", "jaccard", "pair_type")
    )
    out = cross
    if include_within_batch:
        wcand = adaptive_coalesce(
            new_bands.alias("a")
            .join(new_bands.alias("b"), "bk")
            .filter(F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_index"),
                F.col("b.id").alias("id_new"),
            )
            .distinct(),
            new_df,
        )
        within = (
            wcand.join(
                new_sh.withColumnsRenamed(
                    {"id": "id_index", "sh": "sh_i"}
                ),
                "id_index",
            )
            .join(
                new_sh.withColumnsRenamed({"id": "id_new", "sh": "sh_n"}),
                "id_new",
            )
            .select(
                "id_index",
                "id_new",
                jaccard(F.col("sh_i"), F.col("sh_n")).alias("jaccard"),
                F.lit("new-new").alias("pair_type"),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_index", "id_new", "jaccard", "pair_type")
        )
        out = cross.unionByName(within)
    out._cached_deps = tuple(cached)  # for dedup.release_cache()
    return out
