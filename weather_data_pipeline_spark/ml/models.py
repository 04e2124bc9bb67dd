"""MLlib training surface (SURVEY.md §2.9 M1-M13).

Model suite parity with the reference (`weather_predictor.py:198-228`):

| reference (sklearn/xgb)        | here (MLlib)                               |
|--------------------------------|--------------------------------------------|
| LinearRegression               | LinearRegression()                         |
| Ridge(alpha=1)                 | LinearRegression(regParam=1, elasticNet=0) |
| RandomForestRegressor(100, 20) | RandomForestRegressor(numTrees, maxDepth)  |
| GradientBoosting(100,.1,5)     | GBTRegressor(maxIter, stepSize, maxDepth)  |
| XGBoost                        | xgboost.spark if installed, else GBT variant (documented deviation) |
| MLP(100,50) regressor          | no MLlib MLP *regressor* — substituted with a deeper GBT; documented deviation |

Training data flows through a Pipeline of VectorAssembler + StandardScaler
(M1/E3) so transform-at-inference is automatic (M11). All metrics via
RegressionEvaluator / BinaryClassificationEvaluator (M6/M8).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.evaluation import (
    BinaryClassificationEvaluator,
    MulticlassClassificationEvaluator,
    RegressionEvaluator,
)
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.ml.regression import (
    GBTRegressor,
    LinearRegression,
    RandomForestRegressor,
)
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # xgboost is optional in this environment
    from xgboost.spark import SparkXGBRegressor  # type: ignore

    HAS_XGBOOST = True
except ImportError:
    HAS_XGBOOST = False

class EmptyTrainingData(ValueError):
    """Raised when a train path receives zero rows: fitting on empty data is
    a CALLER error with a typed, clear message — never an opaque JVM stack
    from deep inside an MLlib fit (registry-wide empty-input contract,
    tests/test_empty_tables.py)."""


def _require_rows(df: DataFrame, what: str) -> None:
    if df.limit(1).count() == 0:
        raise EmptyTrainingData(
            f"{what}: training frame has no rows; supply non-empty data"
        )


EXCLUDED_FEATURE_COLS = {
    "city",
    "timestamp",
    "temperature_future",
    "temp_change_category",
    "will_rain",
    "weather_main",
    "weather_description",
    "time_of_day",
}
LABEL_COL = "temperature_future"


def strip_training_summary(model):
    """Drop MLlib training summaries from a fitted model (PipelineModel
    stages included) and return the model.

    Spark 4.1 workaround: summaries (e.g. BinaryRandomForestClassification-
    TrainingSummaryImpl) hold the SparkSession, whose lazy
    `observationManager` field — once initialized by ANY `df.observe()` in
    the session — is NOT serializable. A later `model.transform` then dies
    in task-closure serialization with
    `NotSerializableException: ObservationManager`. We never read the
    summaries (metrics come from evaluators), so dropping them keeps the
    model's closure session-free and serialization-safe.
    """
    from pyspark import SparkContext

    jvm = SparkContext._active_spark_context._jvm
    stages = getattr(model, "stages", None) or [model]
    for st in stages:
        jo = getattr(st, "_java_obj", None)
        if jo is not None and hasattr(jo, "setSummary"):
            try:
                jo.setSummary(jvm.scala.Option.empty())
            except Exception:
                pass  # model type without a scala setSummary — nothing to strip
    return model


def feature_columns(df: DataFrame, max_null_ratio: float = 0.3) -> list[str]:
    """M1 feature selection (reference `weather_predictor.py:40-59`): numeric
    columns minus ids/labels/raw categoricals, dropping columns over the null
    threshold — one aggregation pass for all ratios (P6)."""
    numeric = [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("double", "float", "integer", "long")
        and f.name not in EXCLUDED_FEATURE_COLS
    ]
    if not numeric:
        return []
    ratios = df.agg(
        *[F.avg(F.col(c).isNull().cast("int")).alias(c) for c in numeric]
    ).first()
    return [c for c in numeric if (ratios[c] or 0.0) <= max_null_ratio]


def feature_pipeline(cols: list[str]) -> Pipeline:
    """M1/E3: assemble → scale, bundled so inference reapplies the exact
    training-time scaling (reference persists the scaler with the model)."""
    return Pipeline(
        stages=[
            VectorAssembler(inputCols=cols, outputCol="raw_features", handleInvalid="keep"),
            StandardScaler(
                inputCol="raw_features", outputCol="features", withMean=True, withStd=True
            ),
        ]
    )


def regressor_suite(fast: bool = False) -> dict[str, object]:
    """M5. `fast=True` shrinks tree counts for test-speed; shapes unchanged."""
    n_trees = 20 if fast else 100
    gbt_iter = 10 if fast else 100
    suite = {
        "linear": LinearRegression(featuresCol="features", labelCol=LABEL_COL),
        "ridge": LinearRegression(
            featuresCol="features", labelCol=LABEL_COL, regParam=1.0, elasticNetParam=0.0
        ),
        "random_forest": RandomForestRegressor(
            featuresCol="features",
            labelCol=LABEL_COL,
            numTrees=n_trees,
            maxDepth=10 if fast else 20,
            seed=42,
        ),
        "gradient_boosting": GBTRegressor(
            featuresCol="features",
            labelCol=LABEL_COL,
            maxIter=gbt_iter,
            stepSize=0.1,
            maxDepth=5,
            seed=42,
        ),
    }
    if HAS_XGBOOST:
        suite["xgboost"] = SparkXGBRegressor(
            features_col="features", label_col=LABEL_COL, n_estimators=gbt_iter
        )
    else:
        # documented deviation: no xgboost wheel / no MLlib MLP regressor in
        # this environment — a deeper GBT stands in for both
        suite["gbt_deep"] = GBTRegressor(
            featuresCol="features",
            labelCol=LABEL_COL,
            maxIter=gbt_iter,
            stepSize=0.1,
            maxDepth=6,
            seed=43,
        )
    return suite


@dataclass
class TrainedModel:
    name: str
    pipeline_model: PipelineModel
    metrics: dict[str, float] = field(default_factory=dict)


def _evaluate(pred: DataFrame, prefix: str) -> dict[str, float]:
    """MSE/MAE/R² in ONE aggregation pass (reference metrics,
    `weather_predictor.py:240-268`). Three RegressionEvaluator calls would
    each re-scan the predictions — over a 5-model × 2-split loop that is 30
    scans instead of 10; the closed forms below match the evaluator
    definitions (R² = 1 − SSE/SST with population SST)."""
    e = F.col("prediction") - F.col(LABEL_COL)
    r = pred.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(e * e).alias("sse"),
        F.sum(F.abs(e)).alias("sae"),
        F.sum(F.col(LABEL_COL)).alias("sy"),
        F.sum(F.col(LABEL_COL) * F.col(LABEL_COL)).alias("syy"),
    ).first()
    sst = r.syy - r.sy * r.sy / r.n
    return {
        f"{prefix}_mse": float(r.sse / r.n),
        f"{prefix}_mae": float(r.sae / r.n),
        f"{prefix}_r2": float(1.0 - r.sse / sst) if sst > 0 else float("nan"),
    }


def train_regressors(
    train: DataFrame,
    test: DataFrame,
    cols: list[str] | None = None,
    fast: bool = False,
    parallelism: int = 5,  # = suite size: all fits in one wave (r11 A/B:
    # 6.5 s -> 5.7 s warm at sf0.1, metrics bit-identical — each fit is
    # seeded and reads the same cached frames regardless of thread count)
) -> list[TrainedModel]:
    """M5+M6: fit the suite, metric each on train and test.

    The fits run on ``parallelism`` driver threads (the same pattern as
    MLlib's own ``CrossValidator(parallelism=...)``): each model's iterative
    stages are short on a cached frame, so concurrent job submission fills
    the scheduler gaps between them — measured 15.2 s → 5.7 s for the
    5-model suite at sf0.1 with bit-identical metrics. Determinism is
    per-model (fixed seeds, one fixed cached partitioning both orders read),
    and result order is the suite's insertion order regardless of completion
    order. On a saturated cluster FIFO scheduling simply serializes the
    stages again, so this can't make the large-data case worse;
    ``parallelism=1`` restores strictly sequential fits."""
    _require_rows(train, "train_regressors")
    cols = cols or feature_columns(train)
    # cache BOTH sides: every fit does many passes over train, and every
    # model's evaluation re-reads test 3× (one per metric) — without the
    # cache each pass replays the full upstream feature DAG
    filled_train = train.fillna(0, subset=cols).cache()
    filled_test = test.fillna(0, subset=cols).cache()

    def _fit_eval(item: tuple[str, object]) -> TrainedModel:
        name, reg = item
        pipe = Pipeline(stages=feature_pipeline(cols).getStages() + [reg])
        model = strip_training_summary(pipe.fit(filled_train))
        m = {}
        m.update(_evaluate(model.transform(filled_train), "train"))
        m.update(_evaluate(model.transform(filled_test), "test"))
        if name == "gbt_deep":
            # surface the parity deviation in the metrics themselves, not
            # only in docs: this slot is the reference's XGBoost (M5)
            m["note"] = "xgboost unavailable in env: GBT(maxDepth=6) stand-in"
        return TrainedModel(name, model, m)

    items = list(regressor_suite(fast).items())
    try:
        if parallelism <= 1:
            results = [_fit_eval(it) for it in items]
        else:
            from concurrent.futures import ThreadPoolExecutor

            # populate both caches with one pass each BEFORE the threads
            # fan out — concurrent fits on an uncached frame race to
            # compute the same partitions (ADVICE r08, rain-classifier
            # sibling), one scan per side vs up to `parallelism` scans
            filled_train.count()
            filled_test.count()
            with ThreadPoolExecutor(max_workers=min(parallelism, len(items))) as ex:
                results = list(ex.map(_fit_eval, items))
    finally:
        filled_train.unpersist()
        filled_test.unpersist()
    return results


def select_best(models: list[TrainedModel]) -> TrainedModel:
    """M7: best by test R² (reference `weather_predictor.py:281-309`)."""
    return max(models, key=lambda m: m.metrics.get("test_r2", float("-inf")))


def prep_classifier_frame(
    df: DataFrame, cols: list[str], label: str = "will_rain"
) -> DataFrame:
    """The classifier's train/test frame prep — label-notnull filter +
    zero-fill. Exposed so downstream consumers (calibration feed) score the
    SAME population the reported metrics were computed on."""
    return df.where(F.col(label).isNotNull()).fillna(0, subset=cols)


def train_rain_classifier(
    train: DataFrame, test: DataFrame, cols: list[str] | None = None, fast: bool = False
) -> TrainedModel:
    """M8: RandomForest rain classifier with balanced class weights
    (reference `weather_predictor.py:313-391`): weight = n/(2·n_class)."""
    cols = cols or feature_columns(train)
    label = "will_rain"
    tr = prep_classifier_frame(train, cols, label)
    _require_rows(tr, "train_rain_classifier")
    te = prep_classifier_frame(test, cols, label)
    counts = {r[label]: r["n"] for r in tr.groupBy(label).agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    tr = tr.withColumn(
        "weight",
        F.when(F.col(label) == 1, F.lit(total / (2.0 * max(counts.get(1, 1), 1))))
        .otherwise(F.lit(total / (2.0 * max(counts.get(0, 1), 1)))),
    )
    clf = RandomForestClassifier(
        featuresCol="features",
        labelCol=label,
        weightCol="weight",
        numTrees=20 if fast else 100,
        seed=42,
    )
    # cache both sides across the fit's many passes and the 4 evaluator
    # passes; unpersisted before returning
    tr = tr.cache()
    te = te.cache()
    pipe = Pipeline(stages=feature_pipeline(cols).getStages() + [clf])
    model = strip_training_summary(pipe.fit(tr))
    # cache the scored frame (projected to the evaluator inputs) so the four
    # evaluators below score ONE transform instead of re-running the RF
    # scoring pass each; they then run on driver threads — each is an
    # independent JVM-side aggregation over the cached frame, so concurrent
    # submission overlaps their scheduling gaps with identical numerics
    pred = model.transform(te).select(
        label, "prediction", "rawPrediction", "probability"
    ).cache()
    # populate the cache with ONE scoring pass before fanning the four
    # evaluators onto threads — otherwise they race onto the uncached frame
    # and each recomputes the same partitions (up to 4x the RF scoring
    # pass, ADVICE r08; same reason pq_encode/ivf_pq_adc_topk count() first)
    pred.count()

    def _ev(metric_name: str):
        if metric_name == "roc_auc":
            ev = BinaryClassificationEvaluator(labelCol=label, metricName="areaUnderROC")
        else:
            ev = MulticlassClassificationEvaluator(
                labelCol=label, predictionCol="prediction", metricName=metric_name
            )
        return float(ev.evaluate(pred))

    from concurrent.futures import ThreadPoolExecutor

    names = ["roc_auc", "accuracy", "weightedPrecision", "weightedRecall"]
    try:
        with ThreadPoolExecutor(max_workers=4) as ex:
            vals = list(ex.map(_ev, names))
        metrics = dict(zip(["roc_auc", "accuracy", "precision", "recall"], vals))
    finally:
        pred.unpersist()
        tr.unpersist()
        te.unpersist()
    return TrainedModel("rain_rf", model, metrics)


def stacking_ensemble(
    train: DataFrame, test: DataFrame, cols: list[str] | None = None, fast: bool = False
) -> TrainedModel:
    """M10 (reference `weather_predictor.py:448-493`): 3 tree/boosted base
    models → their predictions become a 3-feature meta input → linear meta
    learner. Base predictions are produced by sequential transforms (each a
    narrow projection), assembled without leaving the JVM."""
    cols = cols or feature_columns(train)
    base_names = ["random_forest", "gradient_boosting"]
    suite = regressor_suite(fast)
    bases = {n: suite[n] for n in base_names}
    bases["third"] = suite.get("xgboost", suite.get("gbt_deep"))
    tr = train.fillna(0, subset=cols).cache()
    te = test.fillna(0, subset=cols).cache()

    # base fits on driver threads, same pattern (and same determinism
    # argument) as train_regressors' parallelism — dict order preserved
    def _fit_base(item):
        n, reg = item
        pipe = Pipeline(stages=feature_pipeline(cols).getStages() + [reg])
        return n, strip_training_summary(pipe.fit(tr))

    from concurrent.futures import ThreadPoolExecutor

    # one cache-populating pass before the concurrent base fits (ADVICE
    # r08 pattern — see train_regressors); te is populated here too since
    # add_base_preds reads it right after the pool drains
    tr.count()
    te.count()
    with ThreadPoolExecutor(max_workers=len(bases)) as ex:
        fitted = dict(ex.map(_fit_base, bases.items()))

    def add_base_preds(df: DataFrame) -> DataFrame:
        out = df
        for n, m in fitted.items():
            out = (
                m.transform(out)
                .withColumnRenamed("prediction", f"pred_{n}")
                .drop("raw_features", "features")
            )
        return out

    meta_train, meta_test = add_base_preds(tr), add_base_preds(te)
    meta_cols = [f"pred_{n}" for n in fitted]
    meta_pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=meta_cols, outputCol="features"),
            LinearRegression(featuresCol="features", labelCol=LABEL_COL),
        ]
    )
    meta_model = strip_training_summary(meta_pipe.fit(meta_train))
    metrics = _evaluate(meta_model.transform(meta_test), "test")
    tr.unpersist()
    te.unpersist()
    return TrainedModel("stacking", meta_model, metrics)


def grid_search_gbt(
    train: DataFrame, cols: list[str] | None = None, num_folds: int = 3, fast: bool = False
):
    """M9 (reference GridSearchCV, `weather_predictor.py:393-446`):
    ParamGridBuilder + CrossValidator minimizing MSE."""
    cols = cols or feature_columns(train)
    gbt = GBTRegressor(featuresCol="features", labelCol=LABEL_COL, seed=42)
    grid = (
        ParamGridBuilder()
        .addGrid(gbt.maxDepth, [3, 5] if fast else [3, 5, 7])
        .addGrid(gbt.maxIter, [5, 10] if fast else [50, 100])
        .build()
    )
    cv = CrossValidator(
        estimator=Pipeline(stages=feature_pipeline(cols).getStages() + [gbt]),
        estimatorParamMaps=grid,
        evaluator=RegressionEvaluator(labelCol=LABEL_COL, metricName="mse"),
        numFolds=num_folds,
        parallelism=4,
        seed=42,
    )
    cvm = cv.fit(train.fillna(0, subset=cols))
    strip_training_summary(cvm.bestModel)
    return cvm


def feature_importances(model: TrainedModel, cols: list[str]) -> list[tuple[str, float]]:
    """M12: tree-model importances mapped back to column names."""
    last = model.pipeline_model.stages[-1]
    imps = getattr(last, "featureImportances", None)
    if imps is None:
        return []
    arr = imps.toArray()
    return sorted(zip(cols, arr.tolist()), key=lambda t: -t[1])


def save_model(model: TrainedModel, path: str) -> None:
    """S12: PipelineModel.save + metadata JSON beside it (reference bundles
    model+scaler+features+metadata in one joblib pickle)."""
    model.pipeline_model.write().overwrite().save(os.path.join(path, "pipeline"))
    with open(os.path.join(path, "metadata.json"), "w") as f:
        json.dump({"name": model.name, "metrics": model.metrics}, f, indent=2)


def load_model(path: str) -> TrainedModel:
    with open(os.path.join(path, "metadata.json")) as f:
        meta = json.load(f)
    pm = PipelineModel.load(os.path.join(path, "pipeline"))
    return TrainedModel(meta["name"], pm, meta["metrics"])


def predict_latest(
    features: DataFrame, model: TrainedModel, entity_col: str, entity: str, cols: list[str]
) -> DataFrame:
    """M11 serving path (reference `predict_temperature`,
    `dashboard.py:282-310` + `weather_predictor.py:495-508`): select the
    entity's latest engineered row, reapply the persisted scaler+model via
    PipelineModel.transform. The entity filter prunes partitions before any
    feature compute when the table is partitioned by entity."""
    from pyspark.sql import Window

    w = Window.partitionBy(entity_col).orderBy(F.desc("timestamp"))
    latest = (
        features.where(F.col(entity_col) == entity)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .fillna(0, subset=cols)
    )
    return model.pipeline_model.transform(latest).select(
        entity_col, "timestamp", F.col("prediction").alias("predicted_temperature")
    )
