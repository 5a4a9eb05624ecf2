"""Retention policies + late-data merge: the 'retention engine' half of
the north rule.

- :func:`merge_late_turns` — rows arriving for already-rolled buckets
  are handled by an idempotent MERGE keyed ``(conv_id, kind,
  bucket_start)`` (SURVEY.md §2.9): recompute exactly the affected
  buckets from raw+late and upsert them; untouched buckets' rows are
  byte-identical. With Iceberg this is a literal ``MERGE INTO``; on the
  parquet shim it is anti-join + union + bucket-wise dynamic overwrite —
  the same observable semantics.
- :func:`apply_retention` — TTL enforcement per tier: drop buckets older
  than the policy cutoff (explicit ``now`` parameter — retention is a
  deterministic function of policy and clock, never of wall-clock
  inside the job). Coarser tiers keep history the finer tiers shed —
  the whole point of the cascade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ts_raster_spark.operators.rollup import rollup_simple_wide
from ts_raster_spark.sources.catalog import ParquetTierCatalog

KEYS = ["conv_id", "kind", "bucket_start"]


def merge_late_turns(
    spark: SparkSession,
    cat: ParquetTierCatalog,
    tier_table: str,
    tier: str,
    all_turns: DataFrame,
    late_turns: DataFrame,
    kinds: tuple[str, ...] | None = None,
) -> dict:
    """Upsert late-arriving turns into an existing tier table.

    ``all_turns`` must include the late rows (the raw table after the
    late append); only buckets the late rows touch are recomputed.
    ``kinds=None`` infers the channel set from the EXISTING tier table,
    so a merge can never widen a kinds-restricted table's channel set.
    Returns {affected_buckets, rows_before, rows_after}.
    """
    existing = cat.read(spark, tier_table)
    rows_before = existing.count()
    if kinds is None:
        kinds = tuple(r[0] for r in existing.select("kind").distinct().collect())

    # A late turn changes its own bucket for every channel, and (via the
    # latency channel) the FOLLOWING turn's bucket; recompute the whole
    # conversation-bucket set touched by the late conv_ids' affected
    # range. Conservative and cheap: affected = all buckets of the late
    # conversations (a conversation is tiny relative to the table).
    affected_convs = late_turns.select("conv_id").distinct()
    raw_affected = all_turns.join(F.broadcast(affected_convs), "conv_id", "left_semi")
    recomputed = rollup_simple_wide(raw_affected, tier, channels=kinds or None)

    kept = existing.join(F.broadcast(affected_convs), "conv_id", "left_anti")
    # localCheckpoint truncates lineage so the table path can be
    # overwritten while it is also the read source (Iceberg MERGE does
    # this transactionally; the shim materializes first).
    merged = kept.unionByName(recomputed).localCheckpoint()
    cat.write(merged, tier_table)
    out = cat.read(spark, tier_table)
    return {
        "affected_convs": affected_convs.count(),
        "rows_before": rows_before,
        "rows_after": out.count(),
    }


def apply_retention(
    spark: SparkSession,
    cat: ParquetTierCatalog,
    policies: dict[str, str | None],
    now: str,
) -> dict:
    """Enforce TTLs: for each tier table with a policy like '7 days',
    drop buckets with ``bucket_start < now - ttl``; ``None`` keeps
    everything. Returns rows dropped per tier."""
    dropped: dict[str, int] = {}
    for table, ttl in policies.items():
        if ttl is None:
            dropped[table] = 0
            continue
        df = cat.read(spark, table)
        cutoff = F.to_timestamp(F.lit(now)) - F.expr(f"INTERVAL {ttl}")
        before = df.count()
        kept = df.where(F.col("bucket_start") >= cutoff).localCheckpoint()
        cat.write(kept, table, full=True)
        dropped[table] = before - cat.read(spark, table).count()
    return dropped
