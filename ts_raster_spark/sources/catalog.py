"""Table-IO shim: Iceberg-style bucketed tier tables on plain parquet.

The design target is Iceberg with a ``bucket(N, conv_id)`` partition
spec and MERGE-based idempotent tier writes (BASELINE.json north_rule).
No Iceberg runtime jar ships in this sandbox, so this shim reproduces
the *layout semantics* on parquet while keeping the API stable: swap
``ParquetTierCatalog`` for an Iceberg catalog and nothing upstream
changes.

- ``bucket_id = pmod(xxhash64(conv_id), n_buckets)`` is the analog of
  Iceberg's bucket transform: co-locates each conversation's rows,
  enables bucket-pruned point lookups, and gives every tier table the
  same join-friendly clustering.
- writes use dynamic partition overwrite per bucket — re-running a
  job replaces exactly the buckets it produced (idempotent, the MERGE
  stand-in keyed on (conv_id, kind, bucket_start) at file granularity).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def feature_names_dim(spark: SparkSession, wide_df: DataFrame, key_cols=("conv_id",), sep: str = "_") -> DataFrame:
    """Band→feature lookup dim for a wide export (reference
    tsraster/calculate.py:139-144 writes the tsfresh feature-name list
    alongside the banded tiff). One row per non-key column:
    (position, column_name, kind, feature) — position is the 1-based
    band index, so a consumer can map array band i back to (kind,
    feature) without parsing column names. Persist it next to the wide
    table via :meth:`ParquetTierCatalog.write` for a real dim table."""
    rows = []
    pos = 0
    for c in wide_df.columns:
        if c in key_cols:
            continue
        pos += 1
        kind, _, feat = c.rpartition(sep)
        rows.append((pos, c, kind, feat))
    return spark.createDataFrame(
        rows, "position int, column_name string, kind string, feature string"
    )


class ParquetTierCatalog:
    def __init__(self, root: str, n_buckets: int = 16):
        self.root = root
        self.n_buckets = n_buckets

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def with_bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "bucket_id", F.pmod(F.xxhash64("conv_id"), F.lit(self.n_buckets)).cast("int")
        )

    def write(self, df: DataFrame, table: str, mode: str = "overwrite", full: bool = False) -> None:
        """Write a tier table bucketed by conv_id.

        ``mode='overwrite'`` with dynamic partition overwrite replaces
        only the buckets present in ``df`` — the idempotent-MERGE
        stand-in (a resumed job rewrites its own buckets byte-identically
        instead of double-appending). ``full=True`` switches to static
        overwrite (truncate-then-write) for operations that may empty a
        bucket entirely (retention TTL drops).
        """
        spark = df.sparkSession
        conf_key = "spark.sql.sources.partitionOverwriteMode"
        prev = spark.conf.get(conf_key, None)
        spark.conf.set(conf_key, "static" if full else "dynamic")
        try:
            sort_cols = [c for c in ("conv_id", "kind", "bucket_start") if c in df.columns]
            (
                self.with_bucket(df)
                .repartition("bucket_id")
                .sortWithinPartitions(*sort_cols)
                .write.mode(mode)
                .partitionBy("bucket_id")
                .parquet(self.path(table))
            )
        finally:
            # never leak the overwrite mode into the caller's session
            if prev is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prev)

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self.path(table)).drop("bucket_id")

    def row_count(self, table: str) -> int:
        """Row count from parquet footer metadata — zero Spark jobs and
        zero data read (the Iceberg-manifest-statistics stand-in). Keeps
        per-tier lineage counts off the job critical path."""
        import pyarrow.dataset as ds

        return ds.dataset(self.path(table), format="parquet", partitioning="hive").count_rows()

    def write_bucketed_table(self, df: DataFrame, table: str, sort_cols: list[str] | None = None) -> None:
        """Metastore-backed bucketed table (``bucketBy(n, conv_id)``):
        unlike the path-based layout, Spark's planner KNOWS the bucket
        spec, so equi-joins and aggregations on ``conv_id`` between two
        such tables need NO exchange — the co-located-join half of the
        Iceberg bucket story (plan-asserted in tests/test_plans.py)."""
        w = df.write.mode("overwrite").bucketBy(self.n_buckets, "conv_id")
        if sort_cols:
            w = w.sortBy(*sort_cols)
        w.option("path", self.path(table)).saveAsTable(f"tsrs_{table}")

    def read_table(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.table(f"tsrs_{table}")

    def read_conv(self, spark: SparkSession, table: str, conv_id: str) -> DataFrame:
        """Bucket-pruned point lookup: only 1/n_buckets of files scanned
        (the partition filter on bucket_id prunes at planning time)."""
        df = spark.read.parquet(self.path(table))
        bucket = df.sparkSession.range(1).select(
            F.pmod(F.xxhash64(F.lit(conv_id)), F.lit(self.n_buckets)).cast("int").alias("b")
        ).first()["b"]
        return df.where((F.col("bucket_id") == bucket) & (F.col("conv_id") == conv_id)).drop("bucket_id")
