"""Driver-contract invariants of __spark_entry__ that nothing else
enforces: the 50-entry correctness window composition and the oracle
round-rewrite safety check."""

from __future__ import annotations

import pytest

import __spark_entry__ as E

# the driver's correctness artifact records only the first 50 queries()
# entries — every distinct operator surface must sit inside that window
WINDOW = 50

# tail entries are allowed ONLY because an in-window query attests the
# same operator (see queries() docstring) AND they were driver-green in
# earlier rounds, OR they are engine-added ops with full value oracles
# waiting on window space
ALLOWED_TAIL = {
    # round-5 demotions: >=2 green driver rows each (r3 + r4) and an
    # in-window family sibling attesting the surface (queries()
    # docstring maps each to its sibling)
    "rollup_hour_full",
    # late-round demotions for the six new operator families: each
    # r4-green with an in-window sibling (mapping in the tail comment)
    "cms_ngram_counts_day",
    "new_convs_hour",
    "cohort_retention",
    "ohlc_hour",
    "rollup_5min",
    "top_tools_hour",
    "sliding_counts",
    "conv_features",
    "asof_join",
    "stratified_sample",
    "moving_quantiles",
    "feature_relevance_fdr",
    "mask_rollup_hour",
    "cascade_hour_from_minute",
    "gapfill_locf_hour",
    "decontaminate",
    "chunk_documents",
    "dedup_minhash_lsh",
    "ann_signlsh",
    "tfidf_top_terms",
    "stream_stateful_counts",
    "sketch_quantile_hour",
    # demoted in the round-3/4 rotations: >=2 green driver rows each
    # and an in-window family sibling attesting the surface
    "long_panel",
    "role_tool_mix_conv",
    "panel_lag1",
    "gapfill_linear_hour",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "ann_topk_cosine",
    "dedup_embedding_cosine_blocked",
    "lang_id",
    "token_stats",
    "quality_score",
    "fingerprint",
    "train_test_split",
    "minmax_scale",
    "combine_periods",
    "wide_to_long_panel",
    "balanced_panel_check",
    "export_wide_features",
    "session_windows",
    "dedup_components",
    "retention_ttl_hour",
    # demoted round 5 for the sketch_merge_retention slot: multi-green,
    # three stream siblings remain in-window
    "stream_rollup_minute",
    # round-5 tail addition: high-cardinality capped-partials MG,
    # local-gate attested; in-window siblings mg_top_tools_hour/day
    "mg_ngrams_hour",
    # round-5 tail additions: bloom-pruned decontamination (row-equal
    # to exact; sibling curate_corpus) and one-pass GROUPING SETS
    # marginals (siblings turn_count_hour / top_tools_hour)
    "decontaminate_bloom",
    "rollup_grouping_sets",
    # round-5 tail addition: KMV set-algebra sketch, exact twin via
    # engine-neutral kmvsql (siblings hll_users_hour/cohort_retention)
    "kmv_retention_hour",
    # round-5 tail additions: monitoring layer — CUSUM drift (sibling
    # anomaly_turns), hour-of-day climatology (sibling new_convs_hour),
    # all-pairs tool correlation (sibling top_tools_hour)
    "cusum_changepoints",
    "seasonal_anomaly_hour",
    "tool_corr_hour",
    # round-5 tail additions: Mann-Kendall robust trend (sibling
    # conv_features/agg_linear_trend) and sketch-tier PSI drift
    # (sibling sketch_quantile_hour — same histogram bins)
    "mann_kendall_trend",
    "psi_drift_day",
    # round-5 tail additions: lead-lag cross-correlation (sibling
    # tool_corr_hour) and classical decomposition (siblings
    # seasonal_anomaly_hour / moving_stats)
    "tool_leadlag_hour",
    "decompose_hourly",
    # round-5 tail addition: Holt forecasting kernel, exact
    # recursive-CTE twin (sibling ema_turns — smoothing family)
    "holt_smoothing",
}

# entries that MUST be inside the round-5 window: never-green or stale
# (last driver row r1/r2) re-attestations, r4-first entries due a second
# row, queries over code changed this round, and the new day cascades
MUST_BE_IN_WINDOW = {
    # the only never-driver-green entry before round 5
    "ann_ivf",
    # stale: last driver rows r1/r2, shared code changed since
    "moving_stats",
    "sample_turns",
    "unmask_conv_counts",
    "rollup_minute_core",
    "rollup_day_full",
    "cascade_day_from_minute",
    "dedup_embedding_cosine",
    "latency_stats_hour",
    "turn_count_hour",
    "gapfill_sentinel_hour",
    "autocorr_lags",
    "feature_names_dim",
    "feature_relevance",
    # round-5 additions: day-grain double cascades + the sketch-tier
    # MERGE/retention composition
    "sketch_kll_day",
    "mg_top_tools_day",
    "sketch_merge_retention",
    # code changed round 5 (4-dp compress contract, kll total_weight
    # rename, ema routing short-circuit, mg shared merge tail)
    "compress_roundtrip",
    "sketch_kll_hour",
    "mg_top_tools_hour",
    "ema_turns",
    # round-4 promotions holding their slot for a second green row
    "dedup_keep_canonical",
    "repetition_stats",
    "duplicate_lines",
    "embedding_quantize",
    "hll_users_hour",
    "stream_dedup_exact",
    "moving_stats_time",
    "lttb_downsample",
    "asof_tolerance",
    "sliding_counts_hll",
    "stream_sliding_counts",
    "stream_session_windows",
    "anomaly_turns",
    # round-5 late additions: first driver attestation for the six new
    # operator families (slots freed by demoting six r4-green veterans
    # with in-window siblings — see the queries() tail comment)
    "m4_downsample",
    "theil_sen_trend",
    "cms_ngram_counts",
    "interval_join_bursts",
    "funnel_tools",
    "embedding_project",
}


def test_window_composition():
    names = list(E.queries())
    window, tail = set(names[:WINDOW]), set(names[WINDOW:])
    assert MUST_BE_IN_WINDOW <= window, MUST_BE_IN_WINDOW - window
    assert tail <= ALLOWED_TAIL, tail - ALLOWED_TAIL


def test_every_query_has_oracle_or_documented_exception():
    qs = set(E.queries())
    oracles = set(E.oracle_sql())
    # round 4: every query has an oracle — compress_roundtrip checks
    # decoded-stream aggregates against raw, ann_ivf and sketch_kll_hour
    # carry claim-style oracles (in-query verification, constant claim)
    assert qs - oracles == set()
    assert oracles <= qs


def test_nudge_rounds_rewrites_only_round_closes():
    assert (
        E._nudge_rounds("SELECT round(x, 4) AS v")
        == "SELECT round(x + 1e-9, 4) + 0.0 AS v"
    )
    # sql_r4 sites are already nudged and must pass through untouched
    already = "round(x + 1e-9, 4) + 0.0"
    assert E._nudge_rounds(already) == already
    # nested parens inside the round argument
    assert E._nudge_rounds("round(avg(f(a, b)), 4)") == "round(avg(f(a, b)) + 1e-9, 4) + 0.0"
    # a ', 4)' that closes anything else must raise, never rewrite
    for bad in ("substr(x, 1, 4)", "power(x, 4)", "f(a, b, 4)"):
        with pytest.raises(ValueError, match="does not close a round"):
            E._nudge_rounds(f"SELECT {bad} FROM t")


def test_all_oracles_build():
    sqls = E.oracle_sql()
    assert all(isinstance(v, str) and v.strip() for v in sqls.values())
