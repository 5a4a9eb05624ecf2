from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def xy(spark):
    """Learnable synthetic target: y is a noisy function of the latent
    per-conversation stats (FIXTURES.md F3)."""
    from ts_raster_spark.datagen import gen_turns

    t = gen_turns(spark, n_convs=300, min_turns=3, max_turns=40, seed=11)
    feats = t.groupBy("conv_id").agg(
        F.count("*").cast("double").alias("n_turns"),
        F.avg(F.length("text")).alias("mean_text_len"),
        F.avg(F.col("tool").isNotNull().cast("double")).alias("tool_share"),
    )
    noise = (F.abs(F.xxhash64("conv_id")) % 100).cast("double") / 100.0
    out = feats.withColumn("y", F.col("n_turns") * 2 + F.col("mean_text_len") * 0.1 + noise)
    return out.withColumn("y_class", (F.col("n_turns") > 20).cast("int")).cache()


def test_rf_regressor_learns(spark, xy):
    from ts_raster_spark.operators.ml_models import rf_regressor

    model, metrics, pred = rf_regressor(xy, ["n_turns", "mean_text_len", "tool_share"])
    assert metrics["r2"] > 0.9, metrics
    assert pred.count() > 0


def test_rf_classifier_learns(spark, xy):
    from ts_raster_spark.operators.ml_models import rf_classifier

    model, metrics, pred = rf_classifier(xy, ["n_turns", "mean_text_len", "tool_share"])
    assert metrics["accuracy"] > 0.9, metrics
    assert metrics["kappa"] > 0.8, metrics


def test_model_predict_prob(spark, xy):
    """model.py:172-180 parity surface: per-class probabilities keyed by
    conv_id, rows sum to 1, argmax agrees with the point prediction, and
    values equal model.transform's probability vector."""
    import numpy as np
    from pyspark.ml.functions import vector_to_array

    from ts_raster_spark.operators.ml_models import model_predict_prob, rf_classifier

    cols = ["n_turns", "mean_text_len", "tool_share"]
    model, _, _ = rf_classifier(xy, cols)
    out = model_predict_prob(model, xy, cols, keep=["conv_id"]).toPandas()
    assert list(out.columns) == ["conv_id", "prediction"] + [
        f"prob_{i}" for i in range(model.numClasses)
    ]
    assert len(out) == xy.count()
    probs = out[[f"prob_{i}" for i in range(model.numClasses)]].to_numpy()
    assert np.allclose(probs.sum(axis=1), 1.0, atol=1e-9)
    assert (probs.argmax(axis=1) == out["prediction"].to_numpy()).all()

    from ts_raster_spark.operators.ml_models import _assemble

    ref = (
        model.transform(_assemble(xy, cols))
        .select("conv_id", vector_to_array("probability").alias("p"))
        .toPandas()
        .set_index("conv_id")["p"]
    )
    got = out.set_index("conv_id")
    for cid, p in ref.items():
        assert np.allclose(got.loc[cid, [f"prob_{i}" for i in range(len(p))]].to_numpy(), p)


def test_model_predict_keeps_key(spark, xy):
    from ts_raster_spark.operators.ml_models import model_predict, rf_regressor

    model, _, _ = rf_regressor(xy, ["n_turns", "mean_text_len", "tool_share"])
    out = model_predict(model, xy, ["n_turns", "mean_text_len", "tool_share"], keep=["conv_id"])
    assert out.columns == ["conv_id", "prediction"]
    assert out.count() == xy.count()
