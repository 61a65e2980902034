"""Model-based quality filtering (G28) — the classifier stage of a
pretraining data pipeline.

Modern curation pipelines (CCNet, DCLM, FineWeb) filter with a learned
quality classifier, not just hand rules: train a linear model on cheap
per-document features against weak labels (e.g. "looks like a reference
corpus"), then score the whole corpus and keep the top slice. Both halves
map cleanly onto Spark:

- **train** — MLlib ``LogisticRegression`` over an assembled feature
  vector: distributed L-BFGS, executors hold data, driver holds the
  (tiny) coefficient vector. Fit once on a sample.
- **score** — the learned weights are a dozen doubles, so scoring is a
  LITERAL projection compiled into the plan (``w·x + b`` as a sequential
  fold), not a model broadcast and not a UDF: whole-stage codegen, zero
  shuffle, runs at scan speed on any corpus size.

Determinism note: the scoring surface exposed to the oracle is the raw
**logit** (multiply/add over features that are themselves exact or
explicitly rounded — IEEE-deterministic in every engine, given the same
left-to-right fold order). ``sigmoid`` is provided for human-facing
scores but is NOT oracle-comparable (``exp`` is not correctly-rounded
and may differ in the last ulp across engines); thresholding is done in
logit space, which is equivalent (sigmoid is monotone).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import with_text_stats

#: Default feature set: the with_text_stats columns, each either exact
#: (counts, scaled by an exact power-of-two-free constant) or already
#: rounded to 4 decimals by the stats operator — so w·x is reproducible
#: bit-for-bit from the same inputs in any IEEE engine.
DEFAULT_FEATURES = [
    "n_tokens_k",
    "avg_token_len",
    "stopword_ratio",
    "uniq_ratio",
    "punct_ratio",
]


def attach_model_features(stats: DataFrame) -> DataFrame:
    """Derive the model-input columns from an existing ``with_text_stats``
    frame: the scaled token count plus null-safe zeros for the ratios
    (so empty documents score rather than null-propagate). The single
    place the feature derivation lives — ``featurize`` and the curation
    pipeline both route through it."""
    return stats.select(
        "*",
        (F.col("n_tokens").cast("double") / F.lit(1000.0)).alias("n_tokens_k"),
    ).fillna(
        0.0,
        subset=[
            c
            for c in ("avg_token_len", "stopword_ratio", "uniq_ratio",
                      "punct_ratio")
            if c in stats.columns
        ],
    )


def featurize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the DEFAULT_FEATURES columns (one codegen'd projection over
    the scan)."""
    return attach_model_features(with_text_stats(df, text_col))


def logit(
    weights: dict[str, float], bias: float = 0.0
) -> Column:
    """``bias + Σ w_i · feature_i`` as a sequential left fold over the
    dict's iteration order — the literal-projection scoring path."""
    z: Column = F.lit(float(bias))
    for name, w in weights.items():
        z = z + F.col(name).cast("double") * F.lit(float(w))
    return z


def score_documents(
    df: DataFrame,
    weights: dict[str, float],
    bias: float = 0.0,
    keep_logit: float = 0.0,
    text_col: str = "text",
) -> DataFrame:
    """Featurize + score + decide in one projection: adds
    ``quality_logit``, ``quality_score`` (sigmoid, display-only) and
    ``keep`` (logit-space threshold)."""
    feat = featurize(df, text_col)
    z = logit(weights, bias)
    return feat.select(
        "*",
        z.alias("quality_logit"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("quality_score"),
        (z >= F.lit(float(keep_logit))).alias("keep"),
    )


def train_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    feature_cols: list[str] | None = None,
    reg_param: float = 0.0,
    max_iter: int = 50,
) -> tuple[dict[str, float], float]:
    """Fit a logistic-regression quality classifier on a labeled sample;
    returns ``(weights, bias)`` ready for ``score_documents``.

    The input should already carry the feature columns (run ``featurize``
    first); the fit is MLlib's distributed L-BFGS — no data leaves the
    executors. The returned weights are plain Python floats: the model
    deploys as a plan literal, so inference has no MLlib dependency, no
    model broadcast, and survives serialization into any downstream
    pipeline spec."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = feature_cols or DEFAULT_FEATURES
    assembled = VectorAssembler(
        inputCols=feats, outputCol="__features"
    ).transform(labeled)
    model = LogisticRegression(
        featuresCol="__features",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=max_iter,
    ).fit(assembled)
    weights = {c: float(w) for c, w in zip(feats, model.coefficients)}
    return weights, float(model.intercept)


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """G93: classifier calibration (reliability) report — per
    equal-width score bin: count, positives, mean confidence, observed
    positive rate, their gap, and the corpus ECE (expected calibration
    error, Naeini et al. AAAI'15) — the diagnostic that decides whether
    a G28-style quality classifier's scores can be THRESHOLDED at a
    probability (curation cutoffs, budget_score_col weighting) or only
    RANKED. A filter tuned to "keep p ≥ 0.8" on a miscalibrated scorer
    silently shifts the corpus mix; this report is the check.

    Exactness discipline: scores quantize per ROW to integer
    micro-units (``floor(score·1e6)`` — deterministic scalar op), so
    every aggregate is an order-free long sum and the per-bin means are
    integer floor divisions — no float summation anywhere, hash-exact
    cross-engine. ECE = Σ n_b·|gap_b| div N rides a window over the
    ≤ n_bins report rows (bounded relation — not a corpus window).

    Returns ``(bin, n, n_pos, conf_micro, obs_micro, gap_micro,
    ece_micro)`` — bin = ``least(floor(score·n_bins), n_bins-1)``
    (scores at exactly 1.0 land in the top bin), ece_micro identical on
    every row. NULL scores or labels are dropped.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    sm = F.floor(F.col(score_col) * 1_000_000).cast("long")
    # clamp BOTH ends: scores at exactly 1.0 land in the top bin, and
    # out-of-domain scores (a raw linear output below 0 or above 1)
    # clamp into the edge bins instead of minting negative bin ids —
    # their conf_micro means still expose them (sm is unclamped)
    b = F.greatest(
        F.least(
            F.floor(F.col(score_col) * n_bins).cast("int"),
            F.lit(n_bins - 1),
        ),
        F.lit(0),
    )
    rows = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        b.alias("bin"),
        sm.alias("__sm"),
        F.col(label_col).cast("boolean").cast("long").alias("__pos"),
    )
    per_bin = rows.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__pos").cast("long").alias("n_pos"),
        F.expr("sum(__sm) div count(1)").alias("conf_micro"),
        F.expr("(sum(__pos) * 1000000) div count(1)").alias("obs_micro"),
    )
    gap = F.abs(F.col("conf_micro") - F.col("obs_micro"))
    # the empty-frame window below runs over the <= n_bins report rows
    # — a bounded relation, not a corpus window
    return per_bin.select(
        "bin", "n", "n_pos", "conf_micro", "obs_micro",
        gap.cast("long").alias("gap_micro"),
    ).withColumn(
        "ece_micro",
        F.expr(
            "sum(n * gap_micro) over () div sum(n) over ()"
        ).cast("long"),
    )
