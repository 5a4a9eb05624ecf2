"""Round-6 optimization harness: per-query isolation, sub-phase timing,
and plan dumps.  bench.py is FROZEN for measurement; this file exists so
optimization work can (a) time one query at a time with the noop sink,
(b) split a pipeline into sub-phases to localize cost, and (c) dump
`.explain("formatted")` for the plans/r06/ before/after artifacts.

Usage:
    python bench_extra.py --list
    python bench_extra.py --only kll_hour --reps 3
    python bench_extra.py --only e2e_tiers_synth --explain plans/r06/x_before.txt
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from ts_raster_spark.session import get_spark  # noqa: E402
from ts_raster_spark.sources.turns import derive_turns_from_events  # noqa: E402

BENCH_TMP = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_tmp")


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def build_sections(spark, sf_dir, synth_path):
    """Return {name: zero-arg callable returning a DataFrame or running
    an action}.  A callable may return a DataFrame (then it is forced
    via the noop sink and can be explained) or None (it ran its own
    actions, e.g. the tiers-to-storage pipeline)."""
    from ts_raster_spark.operators.cascade import cascade_up
    from ts_raster_spark.operators.changepoint import cusum
    from ts_raster_spark.operators.cms import cms_build
    from ts_raster_spark.operators.dedup import (
        connected_components_star,
        minhash_lsh_pairs,
    )
    from ts_raster_spark.operators.downsample import m4
    from ts_raster_spark.operators.gapfill import gapfill
    from ts_raster_spark.operators.hll import hll_distinct_over_tiers
    from ts_raster_spark.operators.kll import kll_merge, kll_quantiles, kll_sketch
    from ts_raster_spark.operators.longform import to_long_panel
    from ts_raster_spark.operators.mg import mg_merge, mg_sketch
    from ts_raster_spark.operators.rollup import (
        rollup_features,
        rollup_simple,
        rollup_simple_wide,
    )
    from ts_raster_spark.operators.similarity import signlsh_topk
    from ts_raster_spark.operators.textstats import token_stats
    from ts_raster_spark.functions.features_ext import rollup_ext_features

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    turns_sf = derive_turns_from_events(events)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    turns_syn = spark.read.parquet(synth_path) if synth_path and os.path.exists(synth_path) else None

    def tiers(turns, tag):
        def run():
            out_root = os.path.join(BENCH_TMP, f"extra_tiers_{tag}")
            minute = rollup_simple_wide(turns, "minute")
            minute.write.mode("overwrite").parquet(os.path.join(out_root, "minute"))
            hour = cascade_up(spark.read.parquet(os.path.join(out_root, "minute")), "hour")
            hour.write.mode("overwrite").parquet(os.path.join(out_root, "hour"))
            day = cascade_up(spark.read.parquet(os.path.join(out_root, "hour")), "day")
            day.write.mode("overwrite").parquet(os.path.join(out_root, "day"))
        return run

    # sub-phases of the tiers pipeline (noop-forced, no write cost)
    def tiers_minute_df(turns):
        return lambda: rollup_simple_wide(turns, "minute")

    def kll_hour(turns):
        def build():
            long_tl = to_long_panel(turns, channels=("text_len",))
            return kll_quantiles(kll_merge(kll_sketch(long_tl, "minute", k=64), "hour", k=64))
        return build

    def kll_day(turns):
        def build():
            long_tl = to_long_panel(turns, channels=("text_len",))
            sk = kll_merge(kll_merge(kll_sketch(long_tl, "minute", k=64), "hour", k=64), "day", k=64)
            return kll_quantiles(sk)
        return build

    def cms_ngrams(turns):
        def build():
            toks = F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda x: x != F.lit(""),
            )
            grams = F.expr(
                "CASE WHEN size(_toks) >= 2 THEN "
                "transform(sequence(0, size(_toks)-2), i -> concat(_toks[i], ' ', _toks[i+1])) "
                "ELSE array() END"
            )
            t2 = turns.withColumn("_toks", toks).select("ts", F.explode(grams).alias("ngram"))
            return cms_build(t2, "ngram", tier="hour")
        return build

    def _gap(turns):
        def build():
            long_tl = to_long_panel(turns, channels=("text_len",))
            pts = rollup_simple(long_tl, "hour", aggs={"value": F.avg("value")})
            return gapfill(pts, "hour", "locf")
        return build

    def _kll_claim():
        from ts_raster_spark import queries as Q

        return Q.q_sketch_kll_hour(spark, sf_dir)

    sections = {
        "e2e_tiers_sf": tiers(turns_sf, "sf"),
        "tiers_minute_sf": tiers_minute_df(turns_sf),
        "rollup_hour_full_sf": lambda: rollup_features(to_long_panel(turns_sf), tier="hour"),
        "conv_features_sf": lambda: rollup_features(
            to_long_panel(turns_sf).where(F.col("kind") == "text_len"),
            tier=None, include_strikes=True, include_trend=True, include_entropy=True,
        ),
        "conv_features_ext_sf": lambda: rollup_ext_features(
            to_long_panel(turns_sf).where(F.col("kind").isin("text_len", "value")),
            ["conv_id", "kind"],
        ),
        "gapfill_locf_hour_sf": _gap(turns_sf),
        "dedup_minhash_lsh_sf": lambda: minhash_lsh_pairs(docs, k=8, band_size=2),
        "dedup_components_star_sf": lambda: connected_components_star(
            minhash_lsh_pairs(docs, k=8, band_size=2),
            all_nodes=docs.select(F.col("doc_id").alias("node")),
        ),
        "token_stats_sf": lambda: token_stats(docs),
        "hll_users_hour_sf": lambda: hll_distinct_over_tiers(turns_sf, entity="conv_id"),
        "sketch_kll_hour_sf": kll_hour(turns_sf),
        "sketch_kll_day_sf": kll_day(turns_sf),
        "sketch_kll_hour_claim_sf": _kll_claim,
        "mg_top_tools_hour_sf": lambda: mg_merge(mg_sketch(turns_sf, "tool", "minute", k=2), "hour", k=2),
        "cusum_changepoints_sf": lambda: cusum(turns_sf, "value", ("conv_id",), "turn_idx"),
        "cms_build_ngrams_sf": cms_ngrams(turns_sf),
        "m4_downsample_sf": lambda: m4(
            turns_sf.withColumn("text_len", F.length("text").cast("double")),
            width=8, y_col="text_len",
        ),
        "ann_signlsh_sf": lambda: signlsh_topk(emb, list(range(20)), k=3),
        # sub-phases for localization
        "sub_long_panel_sf": lambda: to_long_panel(turns_sf),
        "sub_turns_sf": lambda: turns_sf,
        "sub_long_tl_sf": lambda: to_long_panel(turns_sf, channels=("text_len",)),
        "sub_kll_sketch_min_sf": lambda: kll_sketch(
            to_long_panel(turns_sf, channels=("text_len",)), "minute", k=64
        ),
    }
    if turns_syn is not None:
        sections.update(
            {
                "e2e_tiers_synth": tiers(turns_syn, "syn"),
                "tiers_minute_synth": tiers_minute_df(turns_syn),
                "rollup_hour_full_synth": lambda: rollup_features(to_long_panel(turns_syn), tier="hour"),
                "sub_long_panel_synth": lambda: to_long_panel(turns_syn),
                "sub_attach_stats_synth": lambda: __import__(
                    "ts_raster_spark.functions.features", fromlist=["attach_group_stats"]
                ).attach_group_stats(
                    to_long_panel(turns_syn).withColumn(
                        "bucket_start", F.date_trunc("hour", F.col("ts"))
                    ),
                    ["conv_id", "kind", "bucket_start"],
                ),
            }
        )
    return sections


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain", default=None, help="dump formatted plan of the (single) --only section here")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--synth-path", default=None)
    args = ap.parse_args()

    synth_path = args.synth_path
    if synth_path is None:
        cand = os.path.join(BENCH_TMP, "turns_4000000.parquet")
        synth_path = cand if os.path.exists(cand) else None

    spark = get_spark(
        app_name=f"bench-extra-local[{args.cpus}]",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus * 2, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    sections = build_sections(spark, args.sf_dir, synth_path)
    if args.list:
        print("\n".join(sections))
        return
    names = args.only or [n for n in sections if not n.startswith("sub_")]
    timings = {}
    for name in names:
        fn = sections[name]
        spark.sparkContext.setJobDescription(name)
        best = float("inf")
        for _ in range(max(args.reps, 1)):
            os.sync()
            t0 = time.time()
            out = fn()
            if out is not None:
                _force(out)
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(f"{name}: {timings[name]}s", file=sys.stderr)
        if args.explain and out is not None and len(names) == 1:
            os.makedirs(os.path.dirname(args.explain) or ".", exist_ok=True)
            with open(args.explain, "w") as fh:
                fh.write(out._sc._jvm.PythonSQLUtils.explainString(
                    out._jdf.queryExecution(), "formatted"))
            print(f"plan -> {args.explain}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
