"""Crowd-label aggregation (G81): consolidate many noisy annotations per
item into one training label.

Every large supervised/RLHF data pipeline ends in this reduction: N
annotators (human raters or LLM judges) each emit a label per item, and
the corpus needs ONE label per item plus an agreement signal for
quality filtering. Two estimators:

- **majority vote** — per-item plurality with a deterministic tie-break
  (highest vote count, then label ascending), plus the agreement ratio
  the downstream quality screen thresholds on.
- **reliability-weighted vote** (one Dawid & Skene (1979) EM half-step):
  score each annotator's accuracy against the round-1 majority, then
  re-vote with annotators weighted by that accuracy. One refinement step
  captures most of the EM fixpoint's gain at a fraction of the cost, and
  — unlike the full iterate-to-convergence EM — stays exactly
  SQL-replayable for the oracle.

Weights ride as exact integers (``acc_micro = (n_agree * 1e6) div
n_total + 1``, the G44 micro-gain trick): the weighted vote is an
order-free long sum, bitwise-reproducible across engines and
partitionings. The ``+ 1`` keeps every annotator's vote positive, so an
item annotated only by raters with zero round-1 accuracy still gets a
deterministic label instead of a degenerate all-zero vote.

Scale shape at 100 TB of annotations:
- the (item, label) vote count is ONE map-side-combinable aggregate;
- per-item totals/winners ride windows over that counts relation
  (|items| × |labels| rows — a small multiple of |items|, never the
  annotation volume);
- annotator accuracies are an (annotator)-keyed aggregate reduced to
  |annotators| rows and re-attached by broadcast — annotator pools are
  thousands of raters or a handful of judge models, never corpus-sized;
- the majority relation joins back to annotations on the item key — the
  one annotation-sized exchange the refinement step costs.

No reference counterpart (gap operator; the reference has no labeling
surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ACC_MICRO = 10**6


def _vote_counts(
    ann: DataFrame, item_col: str, label_col: str, weight_expr
) -> DataFrame:
    return ann.groupBy(item_col, label_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_votes"),
        F.sum(weight_expr).cast("long").alias("w_micro"),
    )


def _winner(counts: DataFrame, item_col: str, label_col: str, by: str):
    w = Window.partitionBy(item_col).orderBy(
        F.col(by).desc(), F.col(label_col).asc()
    )
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def aggregate_labels(
    annotations: DataFrame,
    item_col: str = "item_id",
    annotator_col: str = "annotator_id",
    label_col: str = "label",
    reweight: bool = False,
) -> DataFrame:
    """Reduce ``(item, annotator, label)`` annotations to one row per
    item:

    ``(item_col, label, n_votes, n_annotations, n_labels, agreement)``
    — majority label (ties → label ascending), its vote count, the
    item's total annotations and distinct labels, and ``agreement =
    n_votes / n_annotations`` rounded to 4dp.

    With ``reweight=True``, two more columns: ``label_weighted`` (the
    reliability-weighted winner — see module docstring) and
    ``w_micro`` (its exact integer micro-unit weighted vote).

    NULL labels are dropped up front (an annotator abstention, not a
    vote); items whose every annotation is NULL disappear from the
    output.
    """
    ann = annotations.select(item_col, annotator_col, label_col).filter(
        F.col(label_col).isNotNull()
    )
    counts = _vote_counts(ann, item_col, label_col, F.lit(0).cast("long"))
    w_item = Window.partitionBy(item_col)
    counts = counts.select(
        item_col,
        label_col,
        "n_votes",
        F.sum("n_votes").over(w_item).cast("long").alias("n_annotations"),
        F.count(F.lit(1)).over(w_item).cast("long").alias("n_labels"),
    )
    maj = _winner(counts, item_col, label_col, "n_votes").select(
        item_col,
        F.col(label_col).alias("label"),
        "n_votes",
        "n_annotations",
        "n_labels",
        F.round(
            F.col("n_votes") / F.col("n_annotations").cast("double"), 4
        ).alias("agreement"),
    )
    if not reweight:
        return maj

    # Round-1 accuracy per annotator, scored against the majority —
    # |annotators| rows, broadcast back onto the annotations.
    scored = ann.join(
        maj.select(item_col, F.col("label").alias("__maj")), item_col
    )
    # integer floor division, not float: exact on both engines
    acc = scored.groupBy(annotator_col).agg(
        F.expr(
            f"(sum(cast({label_col} = __maj as long)) * {ACC_MICRO}L) "
            f"div count(1) + 1L"
        ).alias("__w")
    )
    wcounts = _vote_counts(
        ann.join(F.broadcast(acc), annotator_col),
        item_col,
        label_col,
        F.col("__w"),
    )
    wwin = _winner(wcounts, item_col, label_col, "w_micro").select(
        item_col,
        F.col(label_col).alias("label_weighted"),
        "w_micro",
    )
    return maj.join(wwin, item_col)
