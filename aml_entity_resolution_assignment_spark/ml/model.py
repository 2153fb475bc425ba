"""Logistic match model: training + scoring (T1-T4, C1).

Reference trains XGBoost (/root/reference/src/train_model.py:57-121);
BASELINE.json north_rule pins a logistic decision boundary instead —
simpler, deterministic, and sufficient (the features are near-linearly
separable by construction; reference README.MD:84 reports P≈100%).

Key property preserved (SURVEY.md §3.2): training candidates come from
the SAME blocking as inference — labels are candidate pairs joined to
ground-truth entity ids (train_model.py:43-49), so the model never sees
pairs blocking cannot produce.

Scoring uses spark.ml's LogisticRegressionModel.transform — JVM-side,
no Python in the loop (C1).
"""

from __future__ import annotations

from pyspark.ml.classification import LogisticRegression, LogisticRegressionModel
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the 7 model features (analog of train_model.py:60-64's list)
MODEL_FEATURES = [
    "host_score",
    "url_score",
    "title_score",
    "jaccard_score",
    "minhash_sim",
    "simhash_sim",
    "lang_match",
]


def label_pairs(features: DataFrame, truth: DataFrame, id_col: str = "url") -> DataFrame:
    """T1 (train_model.py:43-49): label = 1 iff truth entity ids equal."""
    t_a = truth.select(F.col(id_col).alias("id_a"), F.col("entity_id").alias("_ea"))
    t_b = truth.select(F.col(id_col).alias("id_b"), F.col("entity_id").alias("_eb"))
    return (
        features.join(t_a, "id_a")
        .join(t_b, "id_b")
        .withColumn("label", (F.col("_ea") == F.col("_eb")).cast("double"))
        .drop("_ea", "_eb")
    )


def _assemble(df: DataFrame) -> DataFrame:
    cast = df.select(
        "*", *[F.col(c).cast("double").alias(f"_f_{c}") for c in MODEL_FEATURES]
    )
    assembler = VectorAssembler(
        inputCols=[f"_f_{c}" for c in MODEL_FEATURES], outputCol="_fvec"
    )
    return assembler.transform(cast)


def stratified_split(
    labeled: DataFrame, train_frac: float = 0.8, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """T2 (train_model.py:70 `stratify=y`): per-class seeded split —
    the train set holds ~train_frac of EACH class, unlike randomSplit
    whose minority-class fraction drifts on skewed labels.

    Assignment is a DETERMINISTIC row hash (xxhash64 of all columns +
    seed), not sampleBy: sampleBy draws per-partition RNG samples, so
    under a nondeterministic upstream (shuffle without ordering) the
    train set and its exceptAll complement could re-evaluate
    differently — leaking rows into both sides or neither. A content
    hash makes the two sides disjoint and exhaustive by construction,
    independent of partitioning and lineage re-evaluation. Hash
    uniformity within each class gives the stratified ~train_frac per
    class (same approximation sampleBy provides)."""
    buckets = 1_000_000
    side = F.pmod(F.xxhash64(F.struct("*"), F.lit(seed)), F.lit(buckets))
    cut = int(train_frac * buckets)
    train = labeled.where(side < cut)
    test = labeled.where(side >= cut)
    return train, test


def cross_validate_auc(
    labeled: DataFrame,
    n_folds: int = 5,
    seed: int = 42,
    max_iter: int = 100,
    reg_param: float = 0.0,
) -> dict[str, float]:
    """T4 (train_model.py:94-99 StratifiedKFold cross_val_score): 5-fold
    CV ROC-AUC. Folds are assigned by a seeded hash (deterministic,
    partition-invariant); each fold fits on the other k-1 and scores
    held-out rows with BinaryClassificationEvaluator — the spark.ml
    twin of sklearn's cross_val_score(scoring='roc_auc')."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    df = _assemble(labeled).withColumn(
        "_fold", F.pmod(F.xxhash64(F.struct("*"), F.lit(seed)), F.lit(n_folds))
    )
    df = df.persist()
    ev = BinaryClassificationEvaluator(
        rawPredictionCol="rawPrediction", labelCol="label",
        metricName="areaUnderROC",
    )
    aucs = []
    for k in range(n_folds):
        lr = LogisticRegression(
            featuresCol="_fvec", labelCol="label", maxIter=max_iter,
            regParam=reg_param, standardization=True,
        )
        model = lr.fit(df.where(F.col("_fold") != k))
        aucs.append(ev.evaluate(model.transform(df.where(F.col("_fold") == k))))
    df.unpersist()
    out = {f"cv_fold{k}_roc_auc": a for k, a in enumerate(aucs)}
    out["cv_mean_roc_auc"] = sum(aucs) / len(aucs)
    out["cv_folds"] = float(n_folds)
    return out


def train_model(
    labeled: DataFrame,
    model_dir: str,
    seed: int = 42,
    max_iter: int = 100,
    reg_param: float = 0.0,
) -> LogisticRegressionModel:
    """T2-T4: stratified seeded split, class weighting
    (scale_pos_weight analog, train_model.py:76-78 -> weightCol),
    logistic fit, persisted with .save() for deterministic reuse."""
    train, _test = stratified_split(labeled, 0.8, seed=seed)
    counts = {
        r["label"]: r["cnt"]
        for r in train.groupBy("label").agg(F.count("*").alias("cnt")).collect()
    }
    n_pos = counts.get(1.0, 1)
    n_neg = counts.get(0.0, 1)
    pos_weight = n_neg / max(n_pos, 1)
    weighted = train.withColumn(
        "_w", F.when(F.col("label") == 1.0, F.lit(pos_weight)).otherwise(F.lit(1.0))
    )
    lr = LogisticRegression(
        featuresCol="_fvec",
        labelCol="label",
        weightCol="_w",
        maxIter=max_iter,
        regParam=reg_param,
        standardization=True,
    )
    model = lr.fit(_assemble(weighted))
    model.write().overwrite().save(model_dir)
    return model


def model_from_coefficients(
    spark: SparkSession, coefficients: list[float], intercept: float
) -> LogisticRegressionModel:
    """Construct a binomial LogisticRegressionModel with PINNED
    coefficients — no training. Lets the production scoring path (C1:
    save -> load -> JVM transform) be exercised against a closed-form
    sigmoid(w.x + b) oracle, and lets a model fitted elsewhere (e.g. on
    a sample, or offline) be deployed as a deterministic artifact.

    Uses the JVM constructor (Scala `private[spark]` is public in
    bytecode, stable across Spark 3.x/4.x: (uid, coefficientMatrix
    row-major, interceptVector, numClasses, isMultinomial))."""
    from pyspark.ml.common import _py2java
    from pyspark.ml.linalg import DenseMatrix, Vectors

    mat = DenseMatrix(1, len(coefficients), list(coefficients), True)
    jm = spark._jvm.org.apache.spark.ml.classification.LogisticRegressionModel(
        "fixed_coefficients",
        _py2java(spark, mat),
        _py2java(spark, Vectors.dense([float(intercept)])),
        2,
        False,
    )
    model = LogisticRegressionModel(jm)
    # match this module's assembler column so score_with_model can
    # consume the model exactly like a train_model artifact
    model.setFeaturesCol("_fvec")
    return model


def score_with_model(
    spark: SparkSession, features: DataFrame, model_dir: str
) -> DataFrame:
    """C1: append ml_prob = P(match) via the persisted model; JVM-side
    transform, no Python UDF."""
    model = LogisticRegressionModel.load(model_dir)
    scored = model.transform(_assemble(features))
    return scored.withColumn(
        "ml_prob", vector_to_array(F.col(model.getProbabilityCol()))[1]
    ).drop(
        "_fvec",
        model.getPredictionCol(),
        model.getRawPredictionCol(),
        model.getProbabilityCol(),
        *[f"_f_{c}" for c in MODEL_FEATURES],
    )


def evaluate_model(labeled_scored: DataFrame) -> dict[str, float]:
    """ROC-AUC on scored labeled pairs (train_model.py:94-99 analog)."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    df = _assemble(labeled_scored)
    # reuse ml_prob as rawPrediction surrogate
    ev = BinaryClassificationEvaluator(
        rawPredictionCol="_p2", labelCol="label", metricName="areaUnderROC"
    )
    df = df.withColumn(
        "_p2",
        F.array(F.lit(1.0) - F.col("ml_prob"), F.col("ml_prob")).cast("array<double>"),
    )
    from pyspark.ml.functions import array_to_vector

    df = df.withColumn("_p2", array_to_vector("_p2"))
    return {"roc_auc": ev.evaluate(df)}


def explain_contributions(
    scored: DataFrame,
    coefficients: list[float],
    intercept: float,
    feature_cols: list[str] | None = None,
    id_col: str = "doc_id",
    top: int = 3,
) -> DataFrame:
    """Per-row additive explanation of the logistic score — the
    model-side analog of the reference's rule `explanation` strings
    (matching.py:483 joins human-readable reasons per decision) and of
    Splink's match-weight waterfall: a logistic logit is EXACTLY the
    sum of per-feature contributions w_i * x_i plus the intercept, so
    ranking |w_i * x_i| gives a faithful, complete attribution (no
    sampling approximation needed, unlike tree SHAP).

    Output: one row per (record, top-ranked feature) with the feature
    value, signed contribution, rank, and the full logit so consumers
    can verify sum-of-parts. Plan shape: one array-of-structs literal
    melt (explode over a width-F array — F is the feature count, a
    constant) + one ranking window keyed by the record id; everything
    is JVM expressions, no UDFs, no extra scan of the feature table.
    """
    if feature_cols is None:
        feature_cols = MODEL_FEATURES
    if len(feature_cols) != len(coefficients):
        raise ValueError(
            f"explain_contributions: {len(feature_cols)} features vs "
            f"{len(coefficients)} coefficients"
        )
    from pyspark.sql import Window

    logit = F.lit(float(intercept))
    for c, w in zip(feature_cols, coefficients):
        logit = logit + F.col(c).cast("double") * F.lit(float(w))
    melted = scored.select(
        F.col(id_col),
        logit.alias("logit"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("feature"),
                        F.col(c).cast("double").alias("value"),
                        (F.col(c).cast("double") * F.lit(float(w))).alias(
                            "contribution"
                        ),
                    )
                    for c, w in zip(feature_cols, coefficients)
                ]
            )
        ).alias("_x"),
    ).select(id_col, "logit", "_x.*")
    rank_w = Window.partitionBy(id_col).orderBy(
        F.abs(F.col("contribution")).desc(), F.col("feature")
    )
    return (
        melted.withColumn("rank", F.row_number().over(rank_w))
        .where(F.col("rank") <= top)
        .select(
            id_col, "feature", "value", "contribution", "rank", "logit"
        )
    )
