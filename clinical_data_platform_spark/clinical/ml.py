"""MLlib risk model: parity with ml/train.py:181-359 and ml/infer.py:15-26.

Reference recipe: features [AGE, AE_COUNT, SEVERE_AE_COUNT], target
SEVERE_AE_COUNT > 0 (NB: the target is derived from a feature — the
reference leaks deliberately for its demo; reproduced as-is, which is why
the AUC >= 0.65 / AP >= 0.6 gates are trivially satisfiable), 70/30
stratified split, StandardScaler -> LogisticRegression(C=1.0, maxIter=200),
metrics areaUnderROC / areaUnderPR.

Spark shape: VectorAssembler -> StandardScaler -> LogisticRegression in a
pyspark.ml Pipeline; stratified split via sampleBy; evaluators from
BinaryClassificationEvaluator. Batch scoring = model.transform + prob[1].
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame

FEATURES = ["AGE", "AE_COUNT", "SEVERE_AE_COUNT"]
AUC_GATE, AP_GATE = 0.65, 0.60


def prepare(features_df: DataFrame) -> DataFrame:
    out = features_df
    for c in FEATURES:
        out = out.withColumn(c, F.coalesce(F.col(c).cast("double"), F.lit(0.0)))
    return out.withColumn(
        "label", (F.col("SEVERE_AE_COUNT") > 0).cast("double")
    )


def build_pipeline() -> Pipeline:
    assembler = VectorAssembler(inputCols=FEATURES, outputCol="features_raw")
    scaler = StandardScaler(
        inputCol="features_raw", outputCol="features", withMean=True, withStd=True
    )
    # sklearn C=1.0 L2 ~ small ridge; regParam tuned to the same order
    lr = LogisticRegression(
        featuresCol="features", labelCol="label", maxIter=200, regParam=0.01
    )
    return Pipeline(stages=[assembler, scaler, lr])


def stratified_split(df: DataFrame, test_frac: float = 0.3, seed: int = 42):
    """70/30 stratified by label (sampleBy keeps class balance)."""
    train = df.sampleBy("label", {0.0: 1 - test_frac, 1.0: 1 - test_frac}, seed)
    test = df.join(train.select("STUDYID", "SUBJID"), ["STUDYID", "SUBJID"], "left_anti")
    return train, test


def train(features_df: DataFrame, seed: int = 42) -> tuple[PipelineModel, float, float]:
    """Fit and evaluate; returns (model, auc, ap). Raises if the reference's
    performance gates fail (ml/train.py:334-342)."""
    data = prepare(features_df)
    tr, te = stratified_split(data, 0.3, seed)
    model = build_pipeline().fit(tr)
    scored = model.transform(te)
    auc = BinaryClassificationEvaluator(
        labelCol="label", rawPredictionCol="rawPrediction", metricName="areaUnderROC"
    ).evaluate(scored)
    ap = BinaryClassificationEvaluator(
        labelCol="label", rawPredictionCol="rawPrediction", metricName="areaUnderPR"
    ).evaluate(scored)
    if auc < AUC_GATE or ap < AP_GATE:
        raise RuntimeError(f"performance gates failed: auc={auc:.3f} ap={ap:.3f}")
    return model, auc, ap


def score(model: PipelineModel, features_df: DataFrame) -> DataFrame:
    """Batch scoring -> RISK column (predict_proba[:,1], ml/infer.py:15-26)."""
    scored = model.transform(prepare(features_df))
    return scored.select(
        "STUDYID",
        "SUBJID",
        vector_to_array(F.col("probability")).getItem(1).alias("RISK"),
    )


def closed_form_risk(features_df: DataFrame) -> DataFrame:
    """The API's closed-form scorer (api/main.py:171-195):
    z = .02*AGE + .3*AE_COUNT + .6*SEVERE_AE_COUNT - 2, sigmoid,
    confidence tiers on |z| (>1 high, >0.5 medium — api/main.py:180)."""
    z = (
        0.02 * F.col("AGE")
        + 0.3 * F.col("AE_COUNT")
        + 0.6 * F.col("SEVERE_AE_COUNT")
        - 2.0
    )
    risk = 1.0 / (1.0 + F.exp(-z))
    return features_df.select(
        "STUDYID",
        "SUBJID",
        F.round(risk, 6).alias("risk"),
        F.when(F.abs(z) > 1.0, "high")
        .when(F.abs(z) > 0.5, "medium")
        .otherwise("low")
        .alias("confidence"),
    )
