"""pyspark.ml model tail — RandomForest regression/classification.

Reference: tsraster/model.py:81-120 (sklearn RandomForest with
n_estimators=100, max_depth=10, min_samples_leaf=5, min_samples_split=5,
random_state=42; classifier reports accuracy/kappa/confusion, regressor
MSE/R²). Re-expressed on pyspark.ml so training distributes; same
hyperparameters, same metric surface. model_predict (model.py:161-180)
becomes ``model.transform`` keeping the key column.

Tier-3 capability (outside the correctness gate — sklearn and Spark RF
implementations legitimately differ numerically).
"""

from __future__ import annotations

from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.evaluation import (
    MulticlassClassificationEvaluator,
    RegressionEvaluator,
)
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import RandomForestRegressor
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ts_raster_spark.operators.ml_prep import hash_split

RF_PARAMS = dict(numTrees=100, maxDepth=10, minInstancesPerNode=5, seed=42)


def _assemble(df: DataFrame, feature_cols: list[str]) -> DataFrame:
    va = VectorAssembler(inputCols=feature_cols, outputCol="features", handleInvalid="skip")
    return va.transform(df)


def _split(df: DataFrame, key: str = "conv_id", test_frac: float = 0.33):
    s = hash_split(df, [key], test_frac)
    return s.where("split = 'train'").drop("split"), s.where("split = 'test'").drop("split")


def rf_regressor(xy: DataFrame, feature_cols: list[str], target: str = "y") -> tuple:
    """Returns (model, metrics dict with mse/r2, test predictions)."""
    data = _assemble(xy, feature_cols).withColumnRenamed(target, "label")
    train, test = _split(data)
    model = RandomForestRegressor(labelCol="label", featuresCol="features", **RF_PARAMS).fit(train)
    pred = model.transform(test)
    mse = RegressionEvaluator(metricName="mse").evaluate(pred)
    r2 = RegressionEvaluator(metricName="r2").evaluate(pred)
    return model, {"mse": mse, "r2": r2}, pred.select("conv_id", "label", "prediction")


def rf_classifier(xy: DataFrame, feature_cols: list[str], target: str = "y_class") -> tuple:
    """Returns (model, metrics dict with accuracy/kappa/confusion, preds)."""
    data = _assemble(xy, feature_cols).withColumn("label", F.col(target).cast("double"))
    train, test = _split(data)
    model = RandomForestClassifier(labelCol="label", featuresCol="features", **RF_PARAMS).fit(train)
    pred = model.transform(test)
    acc = MulticlassClassificationEvaluator(metricName="accuracy").evaluate(pred)
    # Cohen's kappa from the confusion counts (model.py:95's kappa report)
    conf = (
        pred.groupBy("label", "prediction").count().collect()
    )
    n = sum(r["count"] for r in conf)
    po = sum(r["count"] for r in conf if r["label"] == r["prediction"]) / n
    by_label: dict = {}
    by_pred: dict = {}
    for r in conf:
        by_label[r["label"]] = by_label.get(r["label"], 0) + r["count"]
        by_pred[r["prediction"]] = by_pred.get(r["prediction"], 0) + r["count"]
    pe = sum(by_label.get(k, 0) * by_pred.get(k, 0) for k in by_label) / (n * n)
    kappa = (po - pe) / (1 - pe) if pe < 1 else 0.0
    confusion = {(r["label"], r["prediction"]): r["count"] for r in conf}
    return model, {"accuracy": acc, "kappa": kappa, "confusion": confusion}, pred.select(
        "conv_id", "label", "prediction"
    )


def model_predict(model, df: DataFrame, feature_cols: list[str], keep: list[str]) -> DataFrame:
    """model_predict analog (model.py:161-170): predictions keyed."""
    return model.transform(_assemble(df, feature_cols)).select(*keep, "prediction")


def model_predict_prob(model, df: DataFrame, feature_cols: list[str], keep: list[str]) -> DataFrame:
    """model_predict_prob analog (model.py:172-180): per-class
    probability predictions keyed. The reference returns
    ``predict_proba``'s class-probability matrix; pyspark.ml's RF
    classifier carries the same vector in ``probability`` —
    vector_to_array unpacks it into ``prob_<class>`` columns."""
    from pyspark.ml.functions import vector_to_array

    pred = model.transform(_assemble(df, feature_cols))
    probs = vector_to_array("probability")
    cols = [F.col(c) for c in keep] + [F.col("prediction")] + [
        probs[i].alias(f"prob_{i}") for i in range(model.numClasses)
    ]
    return pred.select(*cols)
