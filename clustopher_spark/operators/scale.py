"""Scale-pattern operators: hypertable-style time rollups, bucketed
co-located joins, and skew salting. These are the 100 TB techniques the
SURVEY's north star calls for, packaged as reusable library functions with
tests that assert on the physical plan (not just results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# --- hypertable rollup --------------------------------------------------------

def time_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    grains: tuple[str, ...] = ("hour", "day", "month"),
) -> DataFrame:
    """Continuous-aggregate hierarchy: one pass per grain, each computed
    from the PREVIOUS grain's partials (count/sum/min/max re-aggregate;
    this is the zoom-pyramid pattern on the time axis). Output:
    (grain, bucket_start, n, total, vmin, vmax).
    """
    finest = grains[0]
    cur = (
        events.groupBy(F.date_trunc(finest, F.col(ts_col)).alias("bucket_start"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("total"),
            F.min(value_col).alias("vmin"),
            F.max(value_col).alias("vmax"),
        )
    )
    out = cur.withColumn("grain", F.lit(finest))
    for grain in grains[1:]:
        cur = (
            cur.groupBy(F.date_trunc(grain, F.col("bucket_start")).alias("bucket_start"))
            .agg(
                F.sum("n").alias("n"),
                F.sum("total").alias("total"),
                F.min("vmin").alias("vmin"),
                F.max("vmax").alias("vmax"),
            )
        )
        out = out.unionByName(cur.withColumn("grain", F.lit(grain)))
    return out


# --- bucketed co-located joins ------------------------------------------------

def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, num_buckets: int = 16
) -> None:
    """Persist as a bucketed table: co-partitioned AND co-sorted on the join
    key, so later equi joins between tables bucketed the same way need NO
    shuffle (SortMergeJoin without Exchange) — the Spark answer to the
    reference's 'pre-indexed' storage layout."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table_name)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    return spark.table(left_table).join(spark.table(right_table), on)


# --- skew salting -------------------------------------------------------------

def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    agg_exprs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed keys: stage 1 groups on
    (key, salt) spreading a hot key over ``salt_buckets`` reducers; stage 2
    merges partials per key. Only works for algebraic aggregates
    (sum/count/min/max) — which is also why A2/A5 use them.

    agg_exprs: {column: one of 'sum'|'count'|'min'|'max'}.
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("_salt")
    stage1_aggs = []
    for col, how in agg_exprs.items():
        fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}[how]
        stage1_aggs.append(fn(col).alias(f"_p_{col}"))
    stage1 = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt").agg(*stage1_aggs)

    stage2_aggs = []
    for col, how in agg_exprs.items():
        merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}[how]
        stage2_aggs.append(merge(f"_p_{col}").alias(f"{how}_{col}"))
    return stage1.groupBy(*key_cols).agg(*stage2_aggs)


# --- small-file compaction ----------------------------------------------------

def parquet_dir_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory, via the Hadoop
    FileSystem API so it works identically on local paths, HDFS, and object
    stores (where the small-file problem actually bites)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, True)
    n, total = 0, 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue  # _SUCCESS, checksums, metadata
        n += 1
        total += st.getLen()
    return n, total


def compact_small_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Maintenance compaction for a fragmented parquet directory — the
    operation every long-lived 100 TB table needs after streaming /
    incremental appends produce thousands of KB-sized files (each file
    costs a scan task + an object-store GET, so read parallelism collapses
    into scheduling overhead).

    Sizes output from the ACTUAL on-disk byte count, not row count:
    ``n_out = ceil(total_bytes / target_file_bytes)``.

    Two modes, chosen by ``sort_cols``:
    * None — ``coalesce(n_out)``: a NARROW dependency, zero shuffle; each
      output task concatenates whole input splits. The cheapest possible
      rewrite and the default for pure bin-packing.
    * sort columns given — ``repartitionByRange(n_out, *sort_cols)`` +
      ``sortWithinPartitions``: one range shuffle that also restores
      clustering, so per-file min/max statistics become disjoint and
      data-skipping works again (the same reason ``catalog.save`` Z-orders).

    Returns the number of output data files written.
    """
    df = spark.read.parquet(path)
    _, total = parquet_dir_stats(spark, path)
    n_out = max(1, -(-total // target_file_bytes))
    if sort_cols:
        df = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        df = df.coalesce(n_out)
    df.write.mode("overwrite").parquet(out_path)
    n_files, _ = parquet_dir_stats(spark, out_path)
    return n_files
