"""Classification-quality metrics as DataFrame aggregations (A11).

Reference: the eval harness scores every run with accuracy plus
macro / micro / weighted precision, recall and F1
(``models/EventPairwiseTemporalityEvaluator.py:58-79`` builds the
label/prediction frame, ``:81-99`` calls sklearn's
``precision_recall_fscore_support`` per average mode). Here the same
numbers are groupBy arithmetic over the confusion counts — no sklearn,
no collect, runs on 10⁹ scored pairs:

    per class c:  tp_c   = |label = c ∧ pred = c|
                  supp_c = |label = c|          (sklearn's support)
                  pred_c = |pred = c|
    precision_c = tp_c / pred_c, recall_c = tp_c / supp_c,
    f1_c = 2PR/(P+R) (0 where the denominator is 0, sklearn's
    zero_division=0 behavior)

    micro    = Σtp / Σpred = Σtp / Σsupp = accuracy (single-label)
    macro    = unweighted class mean
    weighted = support-weighted class mean

The class axis is the union of observed labels and predictions (what
sklearn uses when ``labels`` is not passed), so a class that is only
ever predicted still contributes precision 0 to macro.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def classification_report(
    df: DataFrame, label_col: str = "label", pred_col: str = "prediction"
) -> DataFrame:
    """Per-class metrics: (class, support, tp, n_pred, precision,
    recall, f1), one row per class in labels ∪ predictions."""
    by_label = df.groupBy(F.col(label_col).alias("class")).agg(
        F.count(F.lit(1)).alias("support"),
        F.sum(
            F.when(F.col(pred_col) == F.col(label_col), 1).otherwise(0)
        ).alias("tp"),
    )
    by_pred = df.groupBy(F.col(pred_col).alias("class")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    joined = by_label.join(by_pred, "class", "full_outer").select(
        "class",
        F.coalesce("support", F.lit(0)).alias("support"),
        F.coalesce("tp", F.lit(0)).alias("tp"),
        F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
    )
    precision = F.when(
        F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")
    ).otherwise(F.lit(0.0))
    recall = F.when(
        F.col("support") > 0, F.col("tp") / F.col("support")
    ).otherwise(F.lit(0.0))
    return (
        joined.withColumn("precision", precision)
        .withColumn("recall", recall)
        .withColumn(
            "f1",
            F.when(
                F.col("precision") + F.col("recall") > 0,
                2 * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall")),
            ).otherwise(F.lit(0.0)),
        )
    )


def classification_summary(
    df: DataFrame, label_col: str = "label", pred_col: str = "prediction"
) -> DataFrame:
    """Aggregate metrics: one row —
    (accuracy, macro_precision, macro_recall, macro_f1,
    weighted_precision, weighted_recall, weighted_f1,
    micro_f1, n_classes, n_rows).

    micro precision = micro recall = micro F1 = accuracy for
    single-label multiclass, so only micro_f1 is emitted.
    """
    rep = classification_report(df, label_col, pred_col)
    return rep.agg(
        (F.sum("tp") / F.sum("support")).alias("accuracy"),
        F.avg("precision").alias("macro_precision"),
        F.avg("recall").alias("macro_recall"),
        F.avg("f1").alias("macro_f1"),
        (F.sum(F.col("precision") * F.col("support")) / F.sum("support")).alias(
            "weighted_precision"
        ),
        (F.sum(F.col("recall") * F.col("support")) / F.sum("support")).alias(
            "weighted_recall"
        ),
        (F.sum(F.col("f1") * F.col("support")) / F.sum("support")).alias(
            "weighted_f1"
        ),
        (F.sum("tp") / F.sum("support")).alias("micro_f1"),
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("support").alias("n_rows"),
    )


def pair_metrics(
    pairs: DataFrame,
    truth: DataFrame,
    id_cols: tuple[str, str] = ("id_a", "id_b"),
    label_col: str = "label",
    pred_col: str = "prediction",
) -> DataFrame:
    """Score predicted pair labels against ground-truth pair labels
    (the reference's evaluator input shape: a frame of pairs with a
    predicted and a gold temporality label). Pairs missing from
    ``truth`` are dropped — the evaluator scores the labeled set."""
    keyed = pairs.join(truth, list(id_cols))
    return classification_summary(keyed, label_col, pred_col)
