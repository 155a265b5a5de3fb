"""The train / apply / persist model trio over pyspark.ml.

Reference: every ML model in Tuktu gets three processors — Train, Apply,
Serialize/Deserialize (modules/ml/app/tuktu/ml/processors/
BaseMLProcessor.scala:22-124,130-234) — over hand-rolled model classes
(modules/ml/app/tuktu/ml/models/**). The idiomatic Spark replacement is
``pyspark.ml`` estimators/transformers with MLWriter persistence; this
module is the registry + thin uniform API.

Scale: pyspark.ml estimators are distributed by construction (gradient
aggregation / Lloyd iterations run as DataFrame jobs); VectorAssembler is
a narrow projection. Nothing here collects the training set to the driver.
"""

from __future__ import annotations

from typing import Any

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import (
    DecisionTreeClassifier,
    GBTClassifier,
    LinearSVC,
    LogisticRegression,
    NaiveBayes,
)
from pyspark.ml.clustering import LDA, KMeans
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.fpm import FPGrowth
from pyspark.ml.regression import (
    DecisionTreeRegressor,
    GBTRegressor,
    LinearRegression,
)
from pyspark.sql import DataFrame

# name -> estimator factory(params).  Mirrors the reference's model set
# (SURVEY.md §2.12): linear/logistic/ridge regression, decision tree, GBT,
# SVM, k-means, naive Bayes, LDA, FPGrowth association rules.
ESTIMATORS: dict[str, Any] = {
    "linear_regression": LinearRegression,
    # ridge = linear regression with L2: regParam>0, elasticNetParam=0
    "ridge_regression": lambda **p: LinearRegression(
        **{"regParam": p.pop("regParam", 0.1), "elasticNetParam": 0.0, **p}
    ),
    "logistic_regression": LogisticRegression,
    "decision_tree_classifier": DecisionTreeClassifier,
    "decision_tree_regressor": DecisionTreeRegressor,
    "gradient_boosted_trees": GBTClassifier,
    "gbt_regressor": GBTRegressor,
    "linear_svm": LinearSVC,
    "naive_bayes": NaiveBayes,
    "kmeans": KMeans,
    "lda": LDA,
    "fpgrowth": FPGrowth,
}


def assemble(df: DataFrame, feature_cols: list[str], out: str = "features") -> DataFrame:
    """Pack numeric columns into the ml vector column estimators expect."""
    return VectorAssembler(inputCols=feature_cols, outputCol=out).transform(df)


def train(
    df: DataFrame,
    algorithm: str,
    feature_cols: list[str] | None = None,
    label_col: str | None = None,
    **params: Any,
) -> PipelineModel:
    """Train: assemble features (if given) + fit the named estimator.
    Returns a PipelineModel so `apply_model` works uniformly."""
    if algorithm not in ESTIMATORS:
        raise KeyError(f"unknown algorithm {algorithm!r}; known: {sorted(ESTIMATORS)}")
    stages = []
    if feature_cols:
        stages.append(VectorAssembler(inputCols=feature_cols, outputCol="features"))
        params.setdefault("featuresCol", "features")
    if label_col:
        params.setdefault("labelCol", label_col)
    stages.append(ESTIMATORS[algorithm](**params))
    return Pipeline(stages=stages).fit(df)


def apply_model(df: DataFrame, model: PipelineModel) -> DataFrame:
    """Apply: score a frame with a trained model (adds prediction cols)."""
    return model.transform(df)


def save_model(model: PipelineModel, path: str) -> None:
    """Persist — the reference's Serialize processor."""
    model.write().overwrite().save(path)


def load_model(path: str) -> PipelineModel:
    """Restore — the reference's Deserialize processor."""
    return PipelineModel.load(path)
