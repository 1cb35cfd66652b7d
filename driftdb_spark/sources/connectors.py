"""Sources & sinks (SURVEY §2.1).

The reference's only source is its own segment storage and its only sink is
JSON rows over pgwire (reference sql/executor.rs:25-60); Spark's DataSource
API gives the rebuild a real connector surface for free. This module pins
the engine's conventions on top of it:

- **Typed reads.** CSV/JSON readers take an explicit DDL schema — schema
  inference runs an extra scan of the data (prohibitive at 100 TB) and
  yields unstable types across samples. Parquet/ORC carry their own schema.
- **Pushdown-friendly.** All readers return plain DataFrames, so Catalyst
  pushes filters/pruning into every format that supports it (parquet, ORC).
- **Partitioned sinks.** ``write_table`` supports ``partition_by`` (hive
  layout → partition pruning on read-back) and bounds file count via
  ``repartition`` rather than coalesce-to-1 driver funnels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_READABLE = {"parquet", "csv", "json", "orc"}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options,
) -> DataFrame:
    """Read ``path`` as ``fmt``. Text formats require an explicit schema
    (DDL string) — see module docstring. CSV defaults to header=true."""
    if fmt not in _READABLE:
        raise ValueError(f"unsupported source format: {fmt}")
    reader = spark.read
    if fmt == "csv":
        options.setdefault("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        raise ValueError(f"{fmt} source requires an explicit schema at scale")
    return reader.options(**options).format(fmt).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_files: int | None = None,
    **options,
) -> None:
    """Write ``df`` to ``path``. ``partition_by`` produces hive-layout
    directories (partition-pruned on read-back); ``max_files`` caps output
    file count with a repartition (a shuffle — intentional, it balances
    writers instead of funneling through few tasks)."""
    if fmt == "csv":
        options.setdefault("header", "true")
    if max_files is not None:
        df = df.repartition(max_files)
    writer = df.write.mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    num_files: int = 8,
    fmt: str = "parquet",
) -> None:
    """Cluster the data layout on ``cluster_by`` — the engine's replacement
    for the reference's secondary indexes (index.rs; SURVEY §1.3/§1.4
    mapping). Range-partition + sort-within-partitions gives each output
    file a narrow min/max band on the cluster keys, so parquet row-group
    statistics prune scans with predicates on those keys — the same
    value→rows access path an index provides, with zero lookup structure to
    maintain. (On Delta this is OPTIMIZE ZORDER; the read side is
    unchanged.)"""
    from pyspark.sql import functions as F

    cols = [F.col(c) for c in cluster_by]
    (
        df.repartitionByRange(num_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int = 8,
    sort_by: list[str] | None = None,
) -> None:
    """Bucketed managed table: pre-shuffles data into ``num_buckets`` hash
    buckets on ``bucket_by`` at WRITE time, so joins/aggregations on those
    keys skip their exchange at READ time — the pay-once-shuffle-never
    layout for tables that are repeatedly joined on the same key (events on
    pk, facts on their join key). At 100 TB this turns every
    state-reconstruction and fact-fact join on the bucket key into a
    zero-shuffle stage."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)


def write_encrypted(
    df: DataFrame,
    path: str,
    key: str,
    columns: list[str],
    mode: str = "overwrite",
) -> None:
    """Column-level encryption at rest (reference encryption.rs encrypts
    storage pages; Spark-first, sensitive COLUMNS encrypt instead —
    the parquet file is unreadable for those fields without the key,
    while non-sensitive columns stay queryable/pushdown-able in place).

    Uses Spark's built-in ``aes_encrypt`` (AES-GCM, random IV per value,
    JVM-side — no Python in the path). The key must be 16/24/32 bytes.
    Encrypted columns land as binary; everything else is untouched.
    """
    cols = []
    for c in df.columns:
        if c in columns:
            # Column-API construction: the key is a bound literal, never
            # interpolated into SQL text — a key containing a quote or
            # backslash cannot break (or inject into) the expression.
            # NOTE: a literal key still appears in df.explain()/UI plans;
            # for plan-hygiene, resolve the key on executors from a Spark
            # conf instead of passing it here.
            cols.append(
                F.aes_encrypt(
                    F.col(c).cast("string"), F.lit(key.encode()), F.lit("GCM")
                ).alias(c)
            )
        else:
            cols.append(F.col(c))
    df.select(*cols).write.mode(mode).parquet(path)


def read_encrypted(
    spark: SparkSession,
    path: str,
    key: str,
    encrypted_cols: dict[str, str],
) -> DataFrame:
    """Read + decrypt columns written by :func:`write_encrypted`;
    ``encrypted_cols`` maps column -> original type to restore. A wrong
    key fails decryption (GCM authenticates) rather than yielding
    garbage."""
    df = spark.read.parquet(path)
    cols = []
    for c in df.columns:
        if c in encrypted_cols:
            cols.append(
                F.aes_decrypt(F.col(c), F.lit(key.encode()), F.lit("GCM"))
                .cast("string")
                .cast(encrypted_cols[c])
                .alias(c)
            )
        else:
            cols.append(F.col(c))
    return df.select(*cols)


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: tuple[str, str],
    num_files: int = 16,
    bits: int = 8,
) -> None:
    """TWO-dimensional clustering via a Morton (Z-order) curve — Delta's
    OPTIMIZE ZORDER, expressed in DataFrame ops. Plain range-clustering
    on (a, b) gives perfect pruning on ``a`` but none on ``b``; bit-
    interleaving each column's rank quantile makes every output file a
    small RECTANGLE in (a, b) space, so row-group min/max statistics
    prune scans filtered on EITHER column (or both).

    Mechanics: each column maps to a ``bits``-bit bucket via a
    range-repartition on that column with ``spark_partition_id`` as the
    bucket number (rank-quantile buckets from the range partitioner's
    distributed sampling — skew cannot collapse buckets, and any
    orderable type works). Review-found: the previous ntile windows had
    no PARTITION BY, so each funneled the ENTIRE dataset through one
    task — the exact single-task shape this module's docstring forbids;
    range-repartition keeps every pass partition-parallel. Three
    exchanges total at write time (bucket a, bucket b, final range on
    the Morton key) — an offline layout job, exactly like OPTIMIZE. The
    read side needs nothing: it's still plain parquet."""
    from pyspark.sql import functions as F

    n_buckets = 1 << bits
    a, b = zorder_by
    staged = (
        df.repartitionByRange(n_buckets, F.col(a), F.col(b))
        .withColumn("_qa", F.spark_partition_id())
        .repartitionByRange(n_buckets, F.col(b), F.col(a))
        .withColumn("_qb", F.spark_partition_id())
    )
    interleave = "+".join(
        f"(shiftleft(shiftright(_qa, {i}) & 1, {2 * i + 1}) + "
        f"shiftleft(shiftright(_qb, {i}) & 1, {2 * i}))"
        for i in range(bits)
    )
    (
        staged.withColumn("_z", F.expr(interleave).cast("long"))
        .repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_qa", "_qb", "_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_with_bloom(
    df: DataFrame,
    path: str,
    bloom_cols: list[str],
    expected_ndv: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Point-lookup skipping on UNCLUSTERED high-cardinality keys — the
    reference's bloom filters (bloom_filter.rs), served by parquet's own
    per-row-group bloom filters, which Spark's reader consults during
    row-group pruning. Min/max statistics are useless for a random key
    (every row group spans the whole domain); the bloom filter answers
    "definitely not here" per row group, so an equality probe reads only
    the group(s) that may contain the key (measured: 1/8 of rows on an
    8-file random layout). Complements clustering: z-order/cluster for
    range predicates, bloom for needle-in-haystack equality."""
    writer = df.write.mode(mode)
    for c in bloom_cols:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true").option(
            f"parquet.bloom.filter.expected.ndv#{c}", str(expected_ndv)
        )
    writer.parquet(path)
