"""Resumable rollup jobs: per-partition checkpoints with lineage.

Reference analog: the ``reset_df``/``my_df.csv`` cached intermediate
(tsraster/calculate.py:79-87) — resume by re-reading a materialized
panel instead of recomputing. The engine upgrades this to a driver-side
**manifest** of completed work slices, each carrying lineage (input
fingerprint, rows in/out, wall time) keyed by the run's slice layout
(``n_slices``), so a killed job redoes only the missing slices and a
layout change can never double-count: slice outputs land in their own
directories, the manifest line is written only after the write
succeeds, and records from a different ``n_slices`` layout are ignored.

Slicing is by conversation hash (``pmod(xxhash64(conv_id), n_slices)``)
— the same transform as the catalog's bucket layout. Resume-cost
design for 100 TB:

- every slice's input fingerprint + row count comes from **one**
  full-input aggregation pass (:func:`slice_lineage`), not a scan per
  slice — a fully-done resume costs one scan total, not 2·n_slices;
- when the input is a catalog-bucketed table, pass the materialized
  partition column as ``slice_col`` (with ``n_slices`` = the catalog's
  ``n_buckets``): the per-slice filter then hits the ``bucket_id=…``
  partition directories and each slice READS only 1/n_slices of the
  files instead of filtering full scans (partition pruning at planning
  time — plan-asserted in tests).

At cluster scale each slice is one spark-submit-able unit of retry.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "manifest.jsonl"


def _slice_expr(n_slices: int, slice_col: str | None = None) -> Column:
    if slice_col:
        return F.col(slice_col).cast("int")
    return F.pmod(F.xxhash64("conv_id"), F.lit(n_slices)).cast("int")


def slice_lineage(
    df: DataFrame, n_slices: int, slice_col: str | None = None
) -> dict[int, dict]:
    """All slices' input lineage (row count + key hash) in ONE pass —
    a groupBy on the slice key instead of a filtered scan per slice."""
    rows = (
        df.groupBy(_slice_expr(n_slices, slice_col).alias("_slice"))
        .agg(
            F.count("*").alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(conv_id, turn_idx))"), F.lit(0)).alias("h"),
        )
        .collect()
    )
    return {
        (int(r["_slice"]) if r["_slice"] is not None else None): {
            "rows_in": r["n"],
            "fingerprint": f"n={r['n']},h={r['h']}",
        }
        for r in rows
    }


def load_manifest(out_dir: str, n_slices: int | None = None) -> dict[int, dict]:
    """Completed-slice records for ONE slice layout. Records are keyed
    by ``n_slices``; with ``n_slices=None`` the most recent run's layout
    (last line's value) is used. Records from any other layout — e.g. a
    previous run with more slices — are discarded, so re-running into
    the same out_dir with a different n_slices can never union stale
    slice directories."""
    path = os.path.join(out_dir, MANIFEST)
    records: list[dict] = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("status") == "done":
                    records.append(rec)
    if not records:
        return {}
    if n_slices is None:
        n_slices = records[-1].get("n_slices")
    return {r["slice_id"]: r for r in records if r.get("n_slices") == n_slices}


def run_checkpointed(
    spark: SparkSession,
    turns: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    out_dir: str,
    n_slices: int = 8,
    fail_after: int | None = None,
    slice_col: str | None = None,
) -> dict:
    """Run ``transform`` over turns in ``n_slices`` conv-hash slices,
    checkpointing each to ``out_dir/slice=<i>`` with a manifest line.

    Re-invocation skips slices whose manifest records ``done`` with a
    matching input fingerprint (changed input → slice recomputed).
    ``slice_col`` names a materialized partition column to slice on
    (catalog ``bucket_id``) so each slice prunes to its own files.
    ``fail_after`` kills the job after that many fresh slices — the
    pytest crash-injection hook (SURVEY.md §5 test 6).

    Returns summary {completed, skipped, rows_out}.
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, MANIFEST)
    done = load_manifest(out_dir, n_slices)
    lineage = slice_lineage(turns, n_slices, slice_col)
    # slice_lineage already saw the FULL value domain — any slice value
    # outside range(n_slices) (slice_col wider than the layout, or NULL)
    # would otherwise silently never be processed and read_result would
    # return a partial dataset with no error
    bad = sorted(
        (s for s in lineage if s is None or not 0 <= s < n_slices),
        key=lambda s: (s is None, s),
    )
    if bad:
        raise ValueError(
            f"slice values {bad} fall outside the n_slices={n_slices} layout"
            + (f" (slice_col={slice_col!r})" if slice_col else "")
            + "; pass n_slices matching the column's value domain"
        )
    completed, skipped, rows_out = 0, 0, 0
    fresh = 0
    for s in range(n_slices):
        info = lineage.get(s, {"rows_in": 0, "fingerprint": "n=0,h=0"})
        if s in done and done[s]["input_fingerprint"] == info["fingerprint"]:
            skipped += 1
            rows_out += done[s]["rows_out"]
            continue
        if fail_after is not None and fresh >= fail_after:
            raise RuntimeError(f"injected failure before slice {s}")
        t0 = time.time()
        part = turns.where(_slice_expr(n_slices, slice_col) == s)
        out = transform(part)
        slice_path = os.path.join(out_dir, f"slice={s}")
        out.write.mode("overwrite").parquet(slice_path)
        # footer-metadata count — no Spark job, no data re-read
        import pyarrow.dataset as ds

        n_out = ds.dataset(slice_path, format="parquet").count_rows()
        rec = {
            "slice_id": s,
            "n_slices": n_slices,
            "status": "done",
            "input_fingerprint": info["fingerprint"],
            "rows_in": info["rows_in"],
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


def read_result(spark: SparkSession, out_dir: str, n_slices: int | None = None) -> DataFrame:
    """Read ONLY the current layout's manifest-listed completed slices —
    a slice=* glob would silently union stale directories left by a
    previous run with a different n_slices (double-counting)."""
    done = load_manifest(out_dir, n_slices)
    if not done:
        raise FileNotFoundError(f"no completed slices recorded in {out_dir}/{MANIFEST}")
    paths = [rec["path"] for rec in done.values()]
    return spark.read.parquet(*paths)
