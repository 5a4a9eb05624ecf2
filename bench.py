"""Bench harness: end-to-end rollup throughput + scaling evidence.

Default mode prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline pipeline (the BASELINE.json metric): raw turns → long panel →
minute tier → hour tier → day tier (algebraic cascade), measured as
turns/sec end-to-end. Inputs:
- the sf-dir events parquet recast as turns (same data the correctness
  gate checks), plus
- a deterministic synthetic turns table (datagen.py) at
  $SPARK_GRAFT_BENCH_TURNS rows (default 2e6) incl. one mega
  conversation, materialized to parquet once (un-timed) so the timed
  pipeline starts from a storage scan like a real tier job.

``--cpus N`` overrides parallelism (used by tools/bench_scaling.py to
run the identical job at local[8] vs local[32] and report scaling
efficiency — the sandbox stand-in for N vs 4N executors).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from ts_raster_spark.datagen import gen_turns  # noqa: E402
from ts_raster_spark.operators.cascade import cascade_up  # noqa: E402
from ts_raster_spark.operators.gapfill import gapfill  # noqa: E402
from ts_raster_spark.operators.longform import to_long_panel  # noqa: E402
from ts_raster_spark.operators.rollup import rollup_features, rollup_simple  # noqa: E402
from ts_raster_spark.session import get_spark  # noqa: E402
from ts_raster_spark.sources.turns import derive_turns_from_events  # noqa: E402

BENCH_TMP = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_tmp")


def _force(df) -> int:
    """Force full execution; count survives whole-stage codegen without
    collecting rows to the driver."""
    return df.count()


def pipeline_tiers(turns):
    """raw -> minute -> hour -> day (the north-rule retention cascade)."""
    long_df = to_long_panel(turns)
    minute = rollup_simple(long_df, "minute")
    hour = cascade_up(minute, "hour")
    day = cascade_up(hour, "day")
    return minute, hour, day


def run(cpus: int, sf_dir: str, n_synth: int, skip_synth: bool = False) -> dict:
    spark = get_spark(
        app_name=f"bench-local[{cpus}]",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    meta: dict[str, float] = {}

    # --- input 1: sf events recast as turns -------------------------------
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    turns_sf = derive_turns_from_events(events)

    t0 = time.time()
    m, h, d = pipeline_tiers(turns_sf)
    rows = (_force(m), _force(h), _force(d))
    timings["e2e_tiers_sf"] = time.time() - t0
    n_sf = turns_sf.count()
    meta["sf_turns"] = n_sf
    meta["sf_tier_rows"] = sum(rows)

    t0 = time.time()
    _force(rollup_features(to_long_panel(turns_sf), tier="hour"))
    timings["rollup_hour_full_sf"] = time.time() - t0

    t0 = time.time()
    long_tl = to_long_panel(turns_sf).where(F.col("kind") == "text_len")
    pts = rollup_simple(long_tl, "hour", aggs={"value": F.avg("value")})
    _force(gapfill(pts, "hour", "locf"))
    timings["gapfill_locf_hour_sf"] = time.time() - t0

    # --- input 2: synthetic turns at scale (mega-conv skew included) ------
    if not skip_synth:
        synth_path = os.path.join(BENCH_TMP, f"turns_{n_synth}.parquet")
        if not os.path.exists(synth_path):
            gen_turns(
                spark,
                n_convs=max(n_synth // 30, 1),
                min_turns=3,
                max_turns=60,
                seed=42,
                mega_conv_turns=max(n_synth // 20, 1000),
            ).write.mode("overwrite").parquet(synth_path)
        turns_syn = spark.read.parquet(synth_path)
        n_syn = turns_syn.count()
        meta["synth_turns"] = n_syn

        t0 = time.time()
        m, h, d = pipeline_tiers(turns_syn)
        _force(m), _force(h), _force(d)
        timings["e2e_tiers_synth"] = time.time() - t0
        meta["synth_turns_per_sec"] = round(n_syn / timings["e2e_tiers_synth"], 1)

        t0 = time.time()
        _force(rollup_features(to_long_panel(turns_syn), tier="hour"))
        timings["rollup_hour_full_synth"] = time.time() - t0

    spark.stop()
    total = sum(timings.values())
    return {
        "metric": "e2e_rollup_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]),
        "cpus": cpus,
        "meta": meta,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--synth-turns", type=int, default=int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "2000000")))
    ap.add_argument("--skip-synth", action="store_true")
    ap.add_argument("--clean", action="store_true", help="drop cached synthetic input first")
    args = ap.parse_args()
    if args.clean and os.path.exists(BENCH_TMP):
        shutil.rmtree(BENCH_TMP)
    out = run(args.cpus, args.sf_dir, args.synth_turns, args.skip_synth)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
