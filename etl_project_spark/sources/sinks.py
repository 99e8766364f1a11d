"""Sink wrappers: batched JDBC and partitioned parquet.

≙ the reference's load stage (flows/etl.py:244-286): DDL-from-schema
(`df.head(n=0).to_sql(if_exists='replace')`, :256-258) and 5,000-row
chunked multi-row INSERTs (:261-284). Spark subsumes both: `mode` issues
the DDL and `batchsize` batches the inserts per executor — the
driver-side chunk loop disappears entirely, and N partitions write over
N connections instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: ≙ chunksize at flows/etl.py:261.
DEFAULT_BATCH_SIZE = 5000


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "overwrite",
    batchsize: int = DEFAULT_BATCH_SIZE,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
) -> None:
    """Write a DataFrame to a JDBC table in batched inserts.

    ``mode='overwrite'`` ≙ K1 (DDL-from-schema replace, flows/etl.py:256-258);
    ``mode='append'`` ≙ K2 (chunked append, flows/etl.py:260-286).
    ``num_partitions`` caps concurrent connections (a 1000-task write
    would otherwise open 1000 connections against one database).
    """
    writer = df
    if num_partitions is not None and num_partitions < df.rdd.getNumPartitions():
        writer = df.coalesce(num_partitions)  # no shuffle, narrows tasks
    opts = {"url": url, "dbtable": table, "batchsize": str(batchsize)}
    for k, v in (properties or {}).items():
        opts[k] = v
    writer.write.format("jdbc").options(**opts).mode(mode).save()


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Columnar analytics sink (the scale-path alternative to JDBC).

    ``partition_by`` enables partition pruning for downstream readers;
    ``max_records_per_file`` bounds file sizes without a repartition.
    """
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


def backfill_partitions(
    df: DataFrame, path: str, *, partition_by: list[str]
) -> None:
    """Idempotent partition backfill: overwrite ONLY the partitions
    present in ``df``, leaving sibling partitions untouched.

    The daily-pipeline repair primitive — rerunning one day must not
    truncate the table. ``partitionOverwriteMode=dynamic`` scopes
    overwrite-mode deletion to partitions the write produces (static
    mode, the default, clears the whole table first). Set per-write
    via the DataFrameWriter option so the session default is never
    mutated. Caveat shared with compact_parquet: the swap is
    rename-based — atomic per partition on HDFS/local, eventually
    consistent on object stores without a committer.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def compact_parquet(
    spark,
    path: str,
    *,
    target_records_per_file: int = 1_000_000,
    sort_within_by: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_records_per_file``
    files — the small-files compaction every long-running ingest needs
    (streaming sinks and per-trigger appends accumulate tiny files;
    scan cost at 100 TB is dominated by file-open overhead once files
    drop below a few hundred MB).

    Reads the layout, coalesces to ``ceil(rows / target)`` partitions
    (coalesce: no shuffle), optionally sorts within partitions to
    restore clustering for min/max stats, and replaces the directory
    via a staged write + two renames. Returns the new file count.

    LOCAL-FILESYSTEM ONLY. The swap is rename(live → .old), then
    rename(staged → live), then delete .old: each rename is atomic and
    no data-loss window exists — but between the two renames the live
    path briefly does not exist, so concurrent readers can fail and a
    crash in that window leaves only ``.old`` on disk. That state is
    self-healed here: at entry, if the live path is missing but ``.old``
    survives, it is renamed back before reading (the round-2
    rmtree-then-rename version could actually lose data; this one at
    worst needs the entry-time heal). Python's os/shutil cannot see
    hdfs:// or s3:// paths at all, and object stores have no atomic
    rename anyway — for those, use a table format with snapshot commits
    (Iceberg/Delta) instead of a directory swap, so scheme-prefixed
    paths are rejected outright.
    """
    import math
    import os
    import shutil

    if "://" in path:
        raise ValueError(
            f"compact_parquet swaps directories with os.rename and only "
            f"works on the local filesystem; got scheme-prefixed path {path!r}. "
            "Use a snapshot-committing table format (Iceberg/Delta) for "
            "remote/object storage."
        )
    live = path.rstrip("/")
    staged = live + "._compact_tmp"
    old = live + "._compact_old"
    if not os.path.exists(live) and os.path.exists(old):
        # Crash landed between rename(live→old) and rename(staged→live):
        # the previous data is intact under .old — heal before reading.
        os.rename(old, live)
    df = spark.read.parquet(path)
    rows = df.count()
    n_files = max(1, math.ceil(rows / target_records_per_file))
    out = df.coalesce(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    out.write.mode("overwrite").parquet(staged)
    if os.path.exists(old):  # leftover from a previous crashed swap
        shutil.rmtree(old)
    os.rename(live, old)
    os.rename(staged, live)
    shutil.rmtree(old)
    return len(
        [f for f in os.listdir(live) if f.endswith(".parquet")]
    )


def write_orc(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC columnar sink — same role as parquet for warehouses that
    standardize on ORC (Hive ecosystems); identical pruning/pushdown
    properties, built into Spark (no external package)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_text_format(
    df: DataFrame,
    path: str,
    *,
    format: str = "csv",
    mode: str = "overwrite",
    compression: str | None = None,
    header: bool = True,
) -> None:
    """Interchange sinks (csv / json lines) for boundary hand-offs.

    Row formats are exchange formats, not analytics storage — parquet
    stays the scale path (columnar, statistics, pushdown); these exist
    because pipelines import/export at their edges. ``compression``
    (e.g. gzip) matters at scale: uncompressed text multiplies both
    storage and scan I/O.
    """
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    if format == "csv":
        w.option("header", str(header).lower()).csv(path)
    elif format == "json":
        w.json(path)
    else:
        raise ValueError(f"unsupported text format: {format!r}")


def read_text_format(spark, path: str, *, format: str = "csv", schema=None):
    """Read back an interchange sink; explicit schema preferred (schema
    inference costs an extra pass over the data at scale)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    if format == "csv":
        return r.option("header", "true").csv(path)
    if format == "json":
        return r.json(path)
    raise ValueError(f"unsupported text format: {format!r}")


# --------------------------------------------------------------------------
# Z-order (Morton) clustering: multi-dimensional data layout.
# --------------------------------------------------------------------------
def morton_interleave(cell_a, cell_b, *, bits: int = 8):
    """Interleave two ``bits``-wide non-negative int columns into a
    single Morton code (a₀b₀a₁b₁…): locality in EITHER dimension maps
    to locality in the code, which is what makes one range-partitioned
    sort cluster BOTH dimensions at once.

    Pure JVM bit arithmetic (shift/AND/OR), identical in ANSI SQL —
    oracle-checkable.
    """
    from functools import reduce

    from pyspark.sql import functions as F

    terms = []
    for i in range(bits):
        terms.append(
            F.expr(
                f"shiftleft(shiftright(CAST(({cell_a}) AS BIGINT), {i}) & 1, {2 * i})"
            )
        )
        terms.append(
            F.expr(
                f"shiftleft(shiftright(CAST(({cell_b}) AS BIGINT), {i}) & 1, {2 * i + 1})"
            )
        )
    return reduce(lambda x, y: x.bitwiseOR(y), terms)


def write_zordered(
    df: DataFrame,
    path: str,
    cell_a: str,
    cell_b: str,
    *,
    bits: int = 8,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered by the Morton code of two pre-bucketed
    dimension columns: repartitionByRange on the code (range, not hash
    — neighbors in z-value land in the same file) + an in-partition
    sort, so each parquet file covers a compact 2-D tile and min/max
    row-group stats prune BOTH dimensions.

    This is the layout story for selective 2-D scans at 100 TB: a box
    predicate touches O(perimeter) files instead of every file, with
    zero new runtime machinery — plain parquet + stats pruning.
    """
    from pyspark.sql import functions as F

    keyed = df.withColumn("_z", morton_interleave(cell_a, cell_b, bits=bits))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
