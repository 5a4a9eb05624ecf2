"""Resumable rollup jobs: per-partition checkpoints with lineage.

Reference analog: the ``reset_df``/``my_df.csv`` cached intermediate
(tsraster/calculate.py:79-87) — resume by re-reading a materialized
panel instead of recomputing. The engine upgrades this to a driver-side
**manifest** of completed work slices, each carrying lineage (input
fingerprint, rows in/out, wall time), so a killed job red-oes only the
missing slices and double-counting is structurally impossible
(slice outputs land in their own directories; the manifest line is
written only after the write succeeds).

Slicing is by conversation hash (``pmod(xxhash64(conv_id), n_slices)``)
— the same transform as the catalog's bucket layout, so a slice reads
only its own input buckets when the source is catalog-bucketed. At
cluster scale each slice is one spark-submit-able unit of retry.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "manifest.jsonl"


def _fingerprint(df: DataFrame, slice_id: int, n_slices: int) -> str:
    """Cheap deterministic input lineage: row count + key hash of the
    slice's input rows."""
    row = (
        df.where(F.pmod(F.xxhash64("conv_id"), F.lit(n_slices)) == slice_id)
        .agg(
            F.count("*").alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(conv_id, turn_idx))"), F.lit(0)).alias("h"),
        )
        .first()
    )
    return f"n={row['n']},h={row['h']}"


def load_manifest(out_dir: str) -> dict[int, dict]:
    path = os.path.join(out_dir, MANIFEST)
    done: dict[int, dict] = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("status") == "done":
                    done[rec["slice_id"]] = rec
    return done


def run_checkpointed(
    spark: SparkSession,
    turns: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    out_dir: str,
    n_slices: int = 8,
    fail_after: int | None = None,
) -> dict:
    """Run ``transform`` over turns in ``n_slices`` conv-hash slices,
    checkpointing each to ``out_dir/slice=<i>`` with a manifest line.

    Re-invocation skips slices whose manifest records ``done`` with a
    matching input fingerprint (changed input → slice recomputed).
    ``fail_after`` kills the job after that many fresh slices — the
    pytest crash-injection hook (SURVEY.md §5 test 6).

    Returns summary {completed, skipped, rows_out}.
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, MANIFEST)
    done = load_manifest(out_dir)
    completed, skipped, rows_out = 0, 0, 0
    fresh = 0
    for s in range(n_slices):
        fp = _fingerprint(turns, s, n_slices)
        if s in done and done[s]["input_fingerprint"] == fp:
            skipped += 1
            rows_out += done[s]["rows_out"]
            continue
        if fail_after is not None and fresh >= fail_after:
            raise RuntimeError(f"injected failure before slice {s}")
        t0 = time.time()
        part = turns.where(F.pmod(F.xxhash64("conv_id"), F.lit(n_slices)) == s)
        rows_in = part.count()
        out = transform(part)
        slice_path = os.path.join(out_dir, f"slice={s}")
        out.write.mode("overwrite").parquet(slice_path)
        n_out = spark.read.parquet(slice_path).count()
        rec = {
            "slice_id": s,
            "status": "done",
            "input_fingerprint": fp,
            "rows_in": rows_in,
            "rows_out": n_out,
            "wall_s": round(time.time() - t0, 3),
            "path": slice_path,
        }
        with open(manifest_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        completed += 1
        fresh += 1
        rows_out += n_out
    return {"completed": completed, "skipped": skipped, "rows_out": rows_out}


def read_result(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read ONLY manifest-listed completed slices — a slice=* glob would
    silently union stale directories left by a previous run with a
    different n_slices (double-counting)."""
    done = load_manifest(out_dir)
    if not done:
        raise FileNotFoundError(f"no completed slices recorded in {out_dir}/{MANIFEST}")
    paths = [rec["path"] for rec in done.values()]
    return spark.read.parquet(*paths)
