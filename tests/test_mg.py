"""Misra-Gries heavy-hitters sketch (operators/mg.py): the classic
guarantees (retention above err, undercount ≤ err, err ≤ n/(k+1)),
merge-bound preservation, multiset determinism, and a Spark cascade
vs local replay."""

from __future__ import annotations

import collections

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ts_raster_spark.operators.mg import _mg_from_counts, mg_merge, mg_sketch


def _summary(values, k):
    vc = collections.Counter(values)
    items = np.asarray(sorted(vc), dtype=object)
    counts = np.asarray([vc[i] for i in items], dtype=np.int64)
    it, w, err = _mg_from_counts(items, counts, k)
    return dict(zip(it, w)), err, vc


def test_mg_guarantees_zipf():
    rng = np.random.RandomState(5)
    n = 50000
    # zipf-ish over 1000 items: a few heavy, long tail
    vals = (rng.zipf(1.3, size=n) % 1000).astype(str)
    for k in (4, 8, 32):
        summ, err, vc = _summary(vals, k)
        assert len(summ) <= k
        assert err <= n / (k + 1)
        for item, cnt in vc.items():
            if cnt > err:
                assert item in summ, (k, item, cnt, err)
            if item in summ:
                assert cnt - err <= summ[item] <= cnt, (k, item)


def test_mg_merge_preserves_bounds():
    rng = np.random.RandomState(9)
    k = 8
    parts = [
        (rng.zipf(1.5, size=8000) % 200).astype(str) for _ in range(6)
    ]
    # local replay of mg_merge over the six part-summaries
    summed: collections.Counter = collections.Counter()
    err_in = 0
    for p in parts:
        s, e, _ = _summary(p, k)
        summed.update(s)
        err_in += e
    items = np.asarray(sorted(summed), dtype=object)
    w = np.asarray([summed[i] for i in items], dtype=np.int64)
    it2, w2, err_red = _mg_from_counts(items, w, k)
    err_out = err_in + err_red
    merged = dict(zip(it2, w2))
    vc = collections.Counter(np.concatenate(parts))
    n = sum(vc.values())
    assert err_out <= 2 * n / (k + 1)  # merge at most doubles the bound here
    for item, cnt in vc.items():
        if cnt > err_out:
            assert item in merged, (item, cnt, err_out)
        if item in merged:
            assert cnt - err_out <= merged[item] <= cnt, item


def test_mg_multiset_determinism():
    rng = np.random.RandomState(13)
    vals = (rng.zipf(1.4, size=5000) % 50).astype(str)
    a = _summary(vals, 8)
    b = _summary(rng.permutation(vals), 8)
    assert a[0] == b[0] and a[1] == b[1]


def test_spark_cascade_matches_local(spark, turns_small):
    """minute-grain MG sketches merged to hour == local replay of the
    same deterministic rule; invariants hold vs exact counts."""
    t = turns_small.where(F.col("tool").isNotNull())
    k = 2
    sk = mg_merge(mg_sketch(t, "tool", "minute", k=k), "hour", k=k).toPandas()
    pdf = t.select("tool", "ts").toPandas()
    pdf["minute"] = pdf["ts"].dt.floor("min")
    pdf["hour"] = pdf["ts"].dt.floor("h")
    assert len(sk), "empty sketch"
    for hour, g in pdf.groupby("hour"):
        summed: collections.Counter = collections.Counter()
        err_in = 0
        for _, gm in g.groupby("minute"):
            s, e, _ = _summary(gm["tool"].to_numpy(dtype=object), k)
            summed.update(s)
            err_in += e
        items = np.asarray(sorted(summed), dtype=object)
        w = np.asarray([summed[i] for i in items], dtype=np.int64)
        it2, w2, err_red = _mg_from_counts(items, w, k)
        want = dict(zip(it2, w2))
        rows = sk[sk.bucket_start == hour]
        got = {
            r["item"]: r["weight"] for _, r in rows.iterrows() if r["item"] is not None
        }
        assert got == want, hour
        assert rows["err"].max() == err_in + err_red, hour
        # invariants vs exact
        vc = collections.Counter(g["tool"])
        err_out = err_in + err_red
        for item, cnt in vc.items():
            if cnt > err_out:
                assert item in got
            if item in got:
                assert cnt - err_out <= got[item] <= cnt
