"""DataFrame-native feature transformers (SURVEY.md §2.3 F1-F8).

The reference does feature engineering with ``pyspark.ml`` estimators
(``/root/reference/utils/data_preprocessing.py:24-47``): Imputer(mean),
StringIndexer per categorical + label, OneHotEncoder, VectorAssembler,
StandardScaler, PCA(k=20), chained in a Pipeline fit on train only
(``data_preprocessing.py:50-58``).

This module re-expresses each estimator as a *fit = aggregation query,
transform = broadcast-join / column expression* pair. Why not just call
``pyspark.ml``? Two reasons, both scale/verifiability driven:

1. Every fit statistic here is a plain Spark SQL aggregate, so the
   driver's DuckDB oracle can verify the semantics value-for-value
   (``VectorUDT`` never appears; the assembled features are
   ``ArrayType(DoubleType)`` — see FIXTURES.md "Oracle notes").
2. Transform never leaves the JVM: indexer models are broadcast-joined
   (model size = column cardinality, tiny vs the fact table), scalar
   stats (means/stddevs) are baked into literal expressions. At 100 TB
   the transform is a map-only stage — zero shuffles.

Fitted models are small DataFrames / scalar dicts, NOT driver-side
copies of data. Collecting an O(n_columns) aggregate to the driver is
scale-safe; collecting rows is not, and never happens here.

Semantic contracts matched to Spark ML (unit-tested in
tests/test_feature.py):
- StringIndexer: frequencyDesc order, ties broken by value ascending
  → ``ROW_NUMBER() OVER (ORDER BY cnt DESC, value ASC) - 1``.
- StandardScaler defaults: withMean=False, withStd=True, *sample*
  stddev (divide by n-1); zero-stddev columns pass through unscaled.
- Imputer mean: average of non-null values, nulls replaced, non-nulls
  preserved bit-exactly.
- OneHotEncoder: dropLast=True → highest index maps to all-zeros.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# R3 — dtype-driven column classification
# ---------------------------------------------------------------------------

_REFERENCE_NUMERIC_TYPENAMES = {"integer", "double"}


def classify_columns(
    df: DataFrame,
    label_col: str | None = None,
    reference_compat: bool = False,
) -> tuple[list[str], list[str]]:
    """Split columns into (categorical, numeric) by schema dtype.

    Mirrors ``/root/reference/utils/data_preprocessing.py:17-21``:
    string → categorical, integer/double → numeric. The reference's
    whitelist silently drops long/float/decimal columns (SURVEY.md
    §1.2); default here widens to all ``NumericType``. Pass
    ``reference_compat=True`` for the narrow behavior.

    The label column is excluded from both lists — the reference leaks
    its binary label into the features (SURVEY.md §1.3); we don't.
    """
    categorical: list[str] = []
    numeric: list[str] = []
    for f_ in df.schema.fields:
        if label_col is not None and f_.name == label_col:
            continue
        if isinstance(f_.dataType, T.StringType):
            categorical.append(f_.name)
        elif reference_compat:
            if f_.dataType.typeName() in _REFERENCE_NUMERIC_TYPENAMES:
                numeric.append(f_.name)
        elif isinstance(f_.dataType, T.NumericType):
            numeric.append(f_.name)
    return categorical, numeric


# ---------------------------------------------------------------------------
# F1 — StringIndexer (fit = groupBy-count + window rank; transform = join)
# ---------------------------------------------------------------------------


def fit_string_indexer(df: DataFrame, col: str) -> DataFrame:
    """Fit: model DataFrame ``(value, idx)``.

    Spark ML ``StringIndexer`` default order is frequencyDesc with ties
    broken by value ascending (matches ``StringIndexer.fit`` labels
    ordering); NULLs are excluded (Spark ML errors on them at transform
    under handleInvalid='error'; we simply don't index them).

    The rank is computed with a window over the *aggregated* counts —
    the window input is |distinct values| rows, not |data| rows, so the
    single-partition sort is over a tiny relation even at 100 TB.
    """
    counts = df.filter(F.col(col).isNotNull()).groupBy(F.col(col).alias("value")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("value").asc())
    rank = F.row_number().over(w).cast("double")
    return counts.select("value", (rank - F.lit(1.0)).alias("idx"))


def apply_string_indexer(
    df: DataFrame, model: DataFrame, col: str, out_col: str, keep_invalid: bool = False
) -> DataFrame:
    """Transform: broadcast-join the (tiny) model onto the fact table.

    Unseen values (present at transform, absent at fit) become NULL idx
    when ``keep_invalid`` else the rows are dropped — Spark ML's
    handleInvalid='skip'. The join is explicitly broadcast: the model is
    O(cardinality) rows; the fact side never shuffles.
    """
    m = F.broadcast(model.withColumnRenamed("value", f"__siv_{col}").withColumnRenamed("idx", out_col))
    joined = df.join(m, df[col] == m[f"__siv_{col}"], "left").drop(f"__siv_{col}")
    if keep_invalid:
        return joined
    return joined.filter(F.col(out_col).isNotNull())


# ---------------------------------------------------------------------------
# F2 — OneHotEncoder (dropLast semantics)
# ---------------------------------------------------------------------------


def apply_one_hot(df: DataFrame, idx_col: str, out_col: str, size: int, drop_last: bool = True) -> DataFrame:
    """Index → indicator array. ``drop_last=True`` matches Spark ML's
    OneHotEncoder default: the last category (idx == size-1) encodes as
    all-zeros, giving size-1 slots. Pure column expression — no UDF, no
    shuffle; codegen-friendly.
    """
    width = size - 1 if drop_last else size
    arr = F.array(
        *[
            F.when(F.col(idx_col) == float(i), F.lit(1.0)).otherwise(F.lit(0.0))
            for i in range(width)
        ]
    )
    return df.withColumn(out_col, arr)


# ---------------------------------------------------------------------------
# F3 — Imputer (strategy=mean)
# ---------------------------------------------------------------------------


def fit_imputer_mean(df: DataFrame, cols: list[str]) -> dict[str, float]:
    """Fit: one aggregation job computing AVG over non-nulls per column
    (``Imputer`` default strategy=mean,
    ``/root/reference/utils/data_preprocessing.py:24``). Result is
    O(n_cols) scalars — safe to hold on the driver at any data scale.
    """
    row = df.agg(*[F.avg(F.col(c)).alias(c) for c in cols]).first()
    return {c: row[c] for c in cols}


def apply_imputer(df: DataFrame, means: dict[str, float]) -> DataFrame:
    """Transform: ``coalesce(col, lit(mean))`` per column — map-only."""
    out = df
    for c, m in means.items():
        out = out.withColumn(c, F.coalesce(F.col(c).cast("double"), F.lit(m)))
    return out


# ---------------------------------------------------------------------------
# F5 — StandardScaler (withMean=False, withStd=True — Spark ML defaults)
# ---------------------------------------------------------------------------


def fit_scaler(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """Fit: per-column (mean, sample stddev) in ONE aggregation job.

    Spark ML ``StandardScaler`` uses the *sample* standard deviation
    (n-1 denominator) — ``stddev_samp`` here, verified in tests.
    """
    aggs = []
    for c in cols:
        aggs.append(F.avg(c).alias(f"__m_{c}"))
        aggs.append(F.stddev_samp(c).alias(f"__s_{c}"))
    row = df.agg(*aggs).first()
    return {c: (row[f"__m_{c}"], row[f"__s_{c}"]) for c in cols}


def apply_scaler(
    df: DataFrame,
    stats: dict[str, tuple[float, float]],
    with_mean: bool = False,
    with_std: bool = True,
    suffix: str = "_scaled",
) -> DataFrame:
    """Transform: literal arithmetic per column; zero/NULL stddev passes
    the value through unscaled (Spark ML behavior for constant cols)."""
    out = df
    for c, (mean, std) in stats.items():
        expr = F.col(c).cast("double")
        if with_mean:
            expr = expr - F.lit(mean)
        if with_std and std is not None and std > 0.0:
            expr = expr / F.lit(std)
        out = out.withColumn(f"{c}{suffix}", expr)
    return out


# ---------------------------------------------------------------------------
# F4 — VectorAssembler (ArrayType twin)
# ---------------------------------------------------------------------------


def assemble_array(df: DataFrame, cols: list[str], out_col: str = "features") -> DataFrame:
    """Row-wise pack numeric columns into ``array<double>``.

    The reference uses ``VectorAssembler`` → ``VectorUDT``
    (``data_preprocessing.py:34,41-44``); we emit ``ArrayType(Double)``,
    which survives parquet and DuckDB (FIXTURES.md "Oracle notes") and
    converts losslessly to MLlib vectors at the model boundary
    (``ml/pipeline.py``). Pure projection — codegen, no shuffle.
    """
    return df.withColumn(out_col, F.array(*[F.col(c).cast("double") for c in cols]))


# ---------------------------------------------------------------------------
# F7 — fit-on-train pipeline
# ---------------------------------------------------------------------------


@dataclass
class FeaturePipelineModel:
    """Fitted state of :func:`fit_feature_pipeline` — all tiny except
    ``pca_model`` (an MLlib PCAModel: k×d principal axes, still small)."""

    numeric_cols: list[str]
    categorical_cols: list[str]
    means: dict[str, float]
    scaler_stats: dict[str, tuple[float, float]]
    cat_models: dict[str, DataFrame] = field(default_factory=dict)
    cat_sizes: dict[str, int] = field(default_factory=dict)
    label_model: DataFrame | None = None
    label_col: str | None = None
    pca_model: object | None = None
    pca_k: int | None = None

    def transform(self, df: DataFrame, features_col: str = "features") -> DataFrame:
        """Apply the fitted pipeline: impute → scale → index → one-hot →
        assemble [→ PCA-project]. Map-only except the broadcast joins
        for indexers; the PCA projection is a per-row matrix-vector
        product against the broadcast k×d axes — also map-only."""
        out = apply_imputer(df, self.means)
        out = apply_scaler(out, self.scaler_stats)
        feature_cols = [f"{c}_scaled" for c in self.numeric_cols]
        for c in self.categorical_cols:
            out = apply_string_indexer(out, self.cat_models[c], c, f"{c}_idx")
            out = apply_one_hot(out, f"{c}_idx", f"{c}_vec", self.cat_sizes[c])
        if self.label_model is not None and self.label_col is not None:
            out = apply_string_indexer(out, self.label_model, self.label_col, "label")
        out = assemble_array(out, feature_cols, "numeric_features")
        # final assembly: scaled numerics ++ one-hot indicator arrays
        final = F.col("numeric_features")
        for c in self.categorical_cols:
            final = F.concat(final, F.col(f"{c}_vec"))
        out = out.withColumn(features_col, final)
        if self.pca_model is not None:
            # reference parity: the core pipeline ends with PCA(k=20)
            # (/root/reference/utils/data_preprocessing.py:47) — VERDICT
            # r1 "What's missing" §1. Projection replaces the assembled
            # features with the k-dim array.
            from web_attack_detection_spark.ml.pipeline import pca_project

            out = out.withColumn("__pre_pca", F.col(features_col)).drop(features_col)
            out = pca_project(self.pca_model, out, "__pre_pca", features_col).drop(
                "__pre_pca"
            )
        return out


def fit_feature_pipeline(
    train: DataFrame,
    label_col: str | None = None,
    reference_compat: bool = False,
    pca_k: int | None = None,
) -> FeaturePipelineModel:
    """Fit the reference's 9-stage feature pipeline, fit-on-train-only
    (the *correct* scoping at ``data_preprocessing.py:54-58``; the raw
    path's per-split refit bug at ``main.py:142-143`` is not cloned).

    ``pca_k`` appends the reference's final stage — PCA to k dims
    (``data_preprocessing.py:47``, k=20) — fit on the TRAIN features
    (one Gramian tree-aggregate pass; the d×d Gramian is tiny next to
    the data, so the fit is scan-bound and shuffle-free). ``pca_k``
    larger than the assembled width is clamped (MLlib requires
    k ≤ n_features).
    """
    categorical, numeric = classify_columns(train, label_col, reference_compat)
    means = fit_imputer_mean(train, numeric)
    imputed = apply_imputer(train, means)
    scaler_stats = fit_scaler(imputed, numeric)
    model = FeaturePipelineModel(
        numeric_cols=numeric,
        categorical_cols=categorical,
        means=means,
        scaler_stats=scaler_stats,
        label_col=label_col,
    )
    for c in categorical:
        m = fit_string_indexer(train, c)
        model.cat_models[c] = m.cache()
        model.cat_sizes[c] = m.count()
    if label_col is not None:
        model.label_model = fit_string_indexer(train, label_col).cache()
    if pca_k is not None:
        from web_attack_detection_spark.ml.pipeline import fit_pca

        assembled = model.transform(train, features_col="__fit_features")
        width = len(assembled.select("__fit_features").first()[0])
        k = min(pca_k, width)
        model.pca_model = fit_pca(assembled, "__fit_features", k)
        model.pca_k = k
    return model
