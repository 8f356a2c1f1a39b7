"""IO + partitioning discipline.

Production layout (north rule): Iceberg tables partitioned by
``bucket(N, url)``; this sandbox has no Iceberg runtime jar, so the
same physical discipline is expressed as parquet partitioned by an
explicit ``partition_id = pmod(xxhash64(url), N)`` column — the same
N-way stable url-hash layout (though not Iceberg's exact row-to-bucket
assignment, which is murmur3-based — see write_table), and the
`partitionOverwriteMode=dynamic` writer gives Iceberg-like idempotent
per-partition overwrite. Swap `format("parquet")` for
`writeTo(...iceberg...)` when session.ICEBERG_ENABLED.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def bucket_id(url_col: str | Column, num_buckets: int) -> Column:
    """Deterministic url-hash bucket — aligned with Iceberg's
    bucket(N, url) partition transform intent."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.pmod(F.xxhash64(c), F.lit(num_buckets)).cast("int")


def salted_key(
    key_col: str | Column, salt_source_col: str | Column, salt_buckets: int
) -> Column:
    """Skew salt: key#salt for two-stage aggregation over pathological
    hosts (north rule: salted repartitioning for skewed hosts).

    The salt derives from a per-row column (e.g. the full url when the
    key is the host) — deterministic under task retry, unlike rand().

    NULL keys fold to the literal '(null)' group: concat_ws SKIPS a
    null argument, so the salted key would otherwise degenerate to the
    bare salt digit and un-salting (substring before '#') would
    fabricate phantom groups named '0'..'{salt_buckets-1}'."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    s = (
        F.col(salt_source_col)
        if isinstance(salt_source_col, str)
        else salt_source_col
    )
    return F.concat_ws(
        "#",
        F.coalesce(c.cast("string"), F.lit("(null)")),
        F.pmod(F.xxhash64(s), F.lit(salt_buckets)),
    )


def write_partitioned(
    df: DataFrame, path: str, partition_col: str = "partition_id"
) -> None:
    """Idempotent per-partition overwrite (dynamic mode): re-writing a
    subset of partitions replaces exactly those partitions."""
    (
        df.write.option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .mode("overwrite")
        .parquet(path)
    )


def bucket_transform(num_buckets: int, col: str | Column) -> Column:
    """The north rule's `bucket(N, url)` Iceberg partition transform as
    a column expression (pyspark.sql.functions.bucket). Split out so
    the gated writeTo branch is PLAN-assertable without the Iceberg
    runtime: building the transform and the DataFrameWriterV2 below is
    catalog-free; only create/append touches the catalog."""
    from pyspark.sql.functions import partitioning

    return partitioning.bucket(
        num_buckets, F.col(col) if isinstance(col, str) else col
    )


def iceberg_writer(
    df: DataFrame,
    identifier: str,
    bucket_col: str = "url",
    num_buckets: int | None = None,
):
    """DataFrameWriterV2 for `dqc.{identifier}` with the bucket(N, key)
    partition transform applied when ``num_buckets`` is set. Returned
    UNEXECUTED so tests can assert the spec in this jarless sandbox;
    write_table executes it when session.ICEBERG_ENABLED."""
    w = df.writeTo(f"dqc.{identifier}")
    if num_buckets:
        w = w.partitionedBy(bucket_transform(num_buckets, bucket_col))
    return w


def write_table(
    df: DataFrame,
    identifier: str,
    path: str | None = None,
    bucket_col: str = "url",
    num_buckets: int | None = None,
) -> None:
    """Production sink: Iceberg `writeTo(...).createOrReplace()` (with
    the bucket(N, url) partition transform when ``num_buckets`` is
    set) when the runtime has the Iceberg catalog
    (session.ICEBERG_ENABLED); parquet at `path` otherwise — the
    fallback expresses the ANALOGOUS bucketing discipline as an
    explicit partition_id column: same N-way stable url-hash layout,
    but NOT the same row-to-bucket assignment (partition_id uses
    pmod(xxhash64(url), N); Iceberg's bucket transform is spec'd as
    murmur3_x86_32), so a corpus written via the fallback and later
    migrated into a real bucket(N, url) table lands rows in DIFFERENT
    buckets — don't key resume/pruning logic on cross-format bucket
    equality.

    write_table REPLACES the whole table in every branch: the bucketed
    fallback uses a STATIC partitioned overwrite (the whole path is
    cleared), matching the Iceberg branch's createOrReplace and the
    unbucketed fallback's full overwrite. It must not route through
    write_partitioned — dynamic mode only replaces the partitions
    present in ``df``, so a rewrite whose data happens to miss some
    buckets would leave the old table's rows for those buckets in
    place. For idempotent per-partition RESUME semantics call
    write_partitioned directly (the run_pipeline scored/metrics
    path)."""
    from data_quality_checker_spark.session import ICEBERG_ENABLED

    if ICEBERG_ENABLED:  # pragma: no cover - no Iceberg jars in sandbox
        iceberg_writer(df, identifier, bucket_col, num_buckets).createOrReplace()
    else:
        if path is None:
            raise ValueError("path required for the parquet fallback")
        if num_buckets:
            (
                df.withColumn(
                    "partition_id", bucket_id(bucket_col, num_buckets)
                )
                .write.option("partitionOverwriteMode", "static")
                .partitionBy("partition_id")
                .mode("overwrite")
                .parquet(path)
            )
        else:
            df.write.mode("overwrite").parquet(path)


def read_table_by_name(
    spark: SparkSession, identifier: str, path: str | None = None
) -> DataFrame:
    from data_quality_checker_spark.session import ICEBERG_ENABLED

    if ICEBERG_ENABLED:  # pragma: no cover
        return spark.read.table(f"dqc.{identifier}")
    if path is None:
        raise ValueError("path required for the parquet fallback")
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Spark-native bucketed managed table — the executable stand-in
    for Iceberg's bucket(N, key) when the Iceberg runtime is absent.
    Tables co-bucketed on the same key join/aggregate WITHOUT an
    Exchange (the scan's output partitioning already satisfies the
    join's distribution requirement); sortBy additionally removes the
    per-task Sort from sort-merge joins. This is the co-located-join
    discipline for repeated large-fact joins at 100 TB."""
    writer = df.write.bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.mode("overwrite").format("parquet").saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed managed table (bucket metadata comes from the
    catalog, so the scan reports the bucketed output partitioning)."""
    return spark.table(table_name)


CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    keep_corrupt: bool = True,
) -> DataFrame:
    """JSONL ingest with explicit schema and PERMISSIVE corrupt-record
    capture: malformed lines land whole in ``_corrupt_record`` instead
    of silently vanishing (mode=DROPMALFORMED) or killing the job
    (FAILFAST) — at crawl scale a bad shard must be measurable, not
    fatal. Pair with :func:`corrupt_record_stats`."""
    full = f"{schema}, {CORRUPT_COL} string" if keep_corrupt else schema
    reader = spark.read.schema(full).option("mode", "PERMISSIVE")
    if keep_corrupt:
        reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    keep_corrupt: bool = True,
) -> DataFrame:
    """CSV ingest, same corrupt-record discipline as read_jsonl.
    Note: the CSV parser flags STRUCTURAL malformation (wrong field
    count, unclosed quotes); a type-coercion failure nulls the field
    silently — catch those with quality.cast_failures downstream."""
    full = f"{schema}, {CORRUPT_COL} string" if keep_corrupt else schema
    reader = (
        spark.read.schema(full)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
    )
    if keep_corrupt:
        reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
    return reader.csv(path)


def corrupt_record_stats(df: DataFrame) -> DataFrame:
    """One row: (n_rows, n_corrupt, corrupt_frac) — the ingest-quality
    gate a pipeline checks before scoring a shard (generalizes the
    reference's type-consistency checks to the ingest boundary).

    Materializes the parsed batch first (localCheckpoint) — Spark's
    documented requirement: plans over raw JSON/CSV that effectively
    reference only the internal corrupt column are refused
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN; count(struct(cols)) gets folded
    to count(*) so expression tricks don't survive the optimizer), and
    the CSV parser only detects extra-token malformation for columns it
    actually parses, so a pruned scan also UNDER-COUNTS corrupt rows.
    An ingest gate materializes the shard it is gating anyway."""
    n = F.count(F.lit(1))
    bad = F.sum(F.col(CORRUPT_COL).isNotNull().cast("long"))
    return df.localCheckpoint().agg(
        n.alias("n_rows"),
        bad.alias("n_corrupt"),
        (bad.cast("double") / n).alias("corrupt_frac"),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    max_records_per_file: int = 100_000,
    num_shards: int | None = None,
    shard_key: str | Column = "url",
) -> None:
    """Export a training corpus as size-bounded shards — the format
    downstream data loaders stream (no reference ancestor;
    training-data extension).

    - ``max_records_per_file`` caps rows per output file via Spark's
      own writer option (enforced inside each task, no extra pass).
    - ``num_shards`` additionally repartitions by a hash of
      ``shard_key`` first, so the SET of rows in shard i is
      deterministic across reruns (loader-resumable corpus layout);
      None keeps the upstream partitioning (cheapest).
    - ``fmt='jsonl'`` writes gzip-compressed JSON lines (one doc per
      line — the interchange format most tokenizer pipelines read);
      'parquet' stays columnar for Spark/analytics consumers.
    """
    out = df
    if num_shards is not None:
        key = F.col(shard_key) if isinstance(shard_key, str) else shard_key
        # hash-repartition on a stable key: shard membership depends
        # only on the key, never on input split order
        out = out.repartition(num_shards, F.xxhash64(key))
    writer = out.write.mode("overwrite").option(
        "maxRecordsPerFile", max_records_per_file
    )
    if fmt == "jsonl":
        writer.option("compression", "gzip").json(path)
    elif fmt == "parquet":
        writer.parquet(path)
    else:
        raise ValueError(f"fmt must be 'parquet' or 'jsonl', got {fmt!r}")


def shard_manifest(
    spark,
    path: str,
    fmt: str = "parquet",
    content_digest_col: str | Column | None = None,
) -> DataFrame:
    """Manifest of an exported shard directory — the data-card /
    reproducibility artifact a training run records next to its corpus
    (no reference ancestor; training-data extension): one row per
    shard file with ``(shard, n_rows, n_bytes, content_digest)``.

    ``content_digest`` is ORDER-INSENSITIVE (sum of per-row
    xxhash64-of-JSON as decimal(38,0) — the repo's streaming-parity
    checksum trick), so two exports of the same row set with different
    intra-file order digest identically, while any changed/missing row
    flips it. Rows are serialized with ``to_json`` before hashing
    because raw multi-arg ``xxhash64`` SKIPS null inputs — a value
    migrating between two columns (the other being NULL) would
    otherwise leave the digest unchanged; JSON keeps the field name
    attached to every value. ``content_digest_col`` selects what is
    hashed (defaults to every column; pass e.g.
    ``F.struct('url','text')`` to pin the contract columns only).

    ``shard`` is the file path RELATIVE to the export root (for flat
    exports that is the basename; for partitioned layouts the
    ``key=value/part-...`` suffix keeps it unique). n_bytes comes from
    a recursive Hadoop FileSystem listing — scheme-agnostic (local,
    HDFS, object stores), no data scan, and nested/partitioned
    layouts are fully covered.

    One distributed scan groups by ``input_file_name()`` — no
    driver-side file loop; the listing join is a tiny broadcast."""
    import re as _re

    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"fmt must be 'parquet' or 'jsonl', got {fmt!r}")
    reader = spark.read
    # recursiveFileLookup so nested/partitioned jsonl layouts are read
    # (the byte listing below is recursive; a flat '{path}/*.gz' glob
    # would silently drop nested shards from the manifest). pathGlobFilter
    # keeps the scan to the data files jsonl exports write.
    df = (
        reader.parquet(path)
        if fmt == "parquet"
        else reader.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.gz")
        .json(path)
    )
    digest_src = (
        F.struct(*[F.col(c) for c in df.columns])
        if content_digest_col is None
        else (
            F.col(content_digest_col)
            if isinstance(content_digest_col, str)
            else content_digest_col
        )
    )
    from pyspark.sql.types import StructType as _StructType

    if not isinstance(
        df.select(digest_src).schema[0].dataType, _StructType
    ):
        digest_src = F.struct(digest_src)

    # scheme-strip both sides to one normalized absolute form so the
    # Spark-side input_file_name URIs and the driver-side Hadoop
    # listing agree ("file:///x", "file:/x", "hdfs://nn/x" -> "/x")
    _scheme = r"^[a-zA-Z][a-zA-Z0-9+.-]*:/+"
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )
    root = _re.sub(_scheme, "/", fs.makeQualified(jpath).toString())
    root = root.rstrip("/")
    # recursive listing shared with compact_parquet (one implementation)
    size_df = spark.createDataFrame(
        list_data_files(spark, path), "shard string, n_bytes long"
    )

    nf = F.regexp_replace(F.input_file_name(), _scheme, "/")
    rel = F.when(
        nf.startswith(root + "/"), F.substring(nf, len(root) + 2, 2**30)
    ).otherwise(F.element_at(F.split(nf, "/"), -1))
    per_file = (
        df.withColumn("shard", rel)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.xxhash64(F.to_json(digest_src)).cast("decimal(38,0)")
            ).alias("content_digest"),
        )
    )
    return per_file.join(F.broadcast(size_df), "shard", "left").select(
        "shard", "n_rows", "n_bytes", "content_digest"
    )


def list_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """Recursive (relative_path, n_bytes) listing of a data directory
    via the Hadoop FileSystem API — scheme-agnostic (local, HDFS,
    object stores), no data scan; hidden/metadata entries (_SUCCESS,
    .crc) are skipped at any depth. The same listing shard_manifest
    performs, exposed for operational tooling."""
    import re as _re

    _scheme = r"^[a-zA-Z][a-zA-Z0-9+.-]*:/+"
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )
    root = _re.sub(_scheme, "/", fs.makeQualified(jpath).toString())
    root = root.rstrip("/")
    out: list[tuple[str, int]] = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        full = _re.sub(_scheme, "/", st.getPath().toString())
        rel = full[len(root) + 1:] if full.startswith(root + "/") else full
        if any(p[:1] in ("_", ".") for p in rel.split("/")):
            continue
        out.append((rel, st.getLen()))
    return sorted(out)


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_mb: int = 256,
    partition_col: str | None = None,
) -> dict:
    """Small-files compaction — the maintenance job every long-lived
    parquet sink needs at crawl scale (a resumable pipeline writing
    per-partition dynamic overwrites accumulates files far below the
    HDFS/object-store sweet spot; scans then pay per-file open cost
    and the NameNode/listing pays per-object).

    Reads ``in_path`` and rewrites it to ``out_path`` with
    ``ceil(on-disk bytes / target_mb)`` output tasks:

    - unpartitioned: ``repartition(n)`` — n near-equal files.
    - with ``partition_col``: ``repartition(n, partition_col)`` then
      ``partitionBy`` — rows of one partition value co-locate in one
      task, so each value compacts to ONE file per directory (the
      classic many-tiny-files-per-partition repair). A partition
      value larger than a healthy single file keeps its one big file
      — split such values upstream (salting) if that matters.

    DELIBERATELY never in-place: Spark refuses to overwrite a path it
    is reading, and a same-path rewrite is non-atomic on every real
    filesystem — write to ``out_path`` and swap directories in the
    orchestrator. target sizing uses the COMPRESSED on-disk bytes, so
    output files land near ``target_mb`` compressed (same codec).

    Returns ``{"files_before", "bytes_before", "target_files",
    "files_after"}``."""
    import math

    if target_mb < 1:
        raise ValueError("need target_mb >= 1")
    before = list_data_files(spark, in_path)
    total = sum(b for _, b in before)
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(in_path)
    if partition_col is None:
        out = df.repartition(n)
        out.write.mode("overwrite").parquet(out_path)
    else:
        out = df.repartition(n, F.col(partition_col))
        out.write.mode("overwrite").partitionBy(partition_col).parquet(
            out_path
        )
    after = list_data_files(spark, out_path)
    return {
        "files_before": len(before),
        "bytes_before": total,
        "target_files": n,
        "files_after": len(after),
    }
