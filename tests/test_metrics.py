"""Classification-metrics operator (A11) vs a pure-python oracle
mirroring sklearn's precision_recall_fscore_support semantics
(the reference's scorer: models/EventPairwiseTemporalityEvaluator.py:81-99)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sems_event_deduplication_spark.operators.metrics import (
    classification_report,
    classification_summary,
    pair_metrics,
)

LABELS = ["same_event", "same_event_previous", "same_event_later", "different_event"]


def _oracle(y, yh):
    """Per-class + averaged P/R/F1 with zero_division=0, classes =
    union of observed labels and predictions (sklearn's default)."""
    classes = sorted(set(y) | set(yh))
    per = {}
    for c in classes:
        tp = sum(1 for a, b in zip(y, yh) if a == c and b == c)
        supp = sum(1 for a in y if a == c)
        npred = sum(1 for b in yh if b == c)
        p = tp / npred if npred else 0.0
        r = tp / supp if supp else 0.0
        f = 2 * p * r / (p + r) if p + r else 0.0
        per[c] = {"precision": p, "recall": r, "f1": f, "support": supp, "tp": tp}
    n = len(y)
    acc = sum(1 for a, b in zip(y, yh) if a == b) / n
    out = {"accuracy": acc, "micro_f1": acc, "per_class": per}
    for m in ("precision", "recall", "f1"):
        out[f"macro_{m}"] = np.mean([per[c][m] for c in classes])
        out[f"weighted_{m}"] = (
            sum(per[c][m] * per[c]["support"] for c in classes) / n
        )
    return out


@pytest.fixture(scope="module")
def scored_pdf():
    rng = np.random.default_rng(7)
    label = rng.choice(LABELS, size=400, p=[0.4, 0.15, 0.15, 0.3])
    # prediction agrees 70% of the time, otherwise a random other label
    flip = rng.random(400) < 0.3
    pred = label.copy()
    pred[flip] = rng.choice(LABELS, size=int(flip.sum()))
    return pd.DataFrame({"label": label, "prediction": pred})


def test_report_matches_oracle(spark, scored_pdf):
    got = (
        classification_report(spark.createDataFrame(scored_pdf))
        .orderBy("class")
        .toPandas()
        .set_index("class")
    )
    want = _oracle(list(scored_pdf["label"]), list(scored_pdf["prediction"]))
    assert set(got.index) == set(want["per_class"])
    for c, w in want["per_class"].items():
        assert got.loc[c, "precision"] == pytest.approx(w["precision"])
        assert got.loc[c, "recall"] == pytest.approx(w["recall"])
        assert got.loc[c, "f1"] == pytest.approx(w["f1"])
        assert got.loc[c, "support"] == w["support"]
        assert got.loc[c, "tp"] == w["tp"]


def test_summary_matches_oracle(spark, scored_pdf):
    row = classification_summary(spark.createDataFrame(scored_pdf)).first()
    want = _oracle(list(scored_pdf["label"]), list(scored_pdf["prediction"]))
    for key in (
        "accuracy", "micro_f1",
        "macro_precision", "macro_recall", "macro_f1",
        "weighted_precision", "weighted_recall", "weighted_f1",
    ):
        assert row[key] == pytest.approx(want[key]), key
    assert row["n_rows"] == len(scored_pdf)
    assert row["n_classes"] == len(want["per_class"])


def test_report_includes_predicted_only_class(spark):
    pdf = pd.DataFrame(
        {"label": ["a", "a", "b"], "prediction": ["a", "c", "b"]}
    )
    got = (
        classification_report(spark.createDataFrame(pdf))
        .orderBy("class")
        .toPandas()
        .set_index("class")
    )
    assert set(got.index) == {"a", "b", "c"}
    assert got.loc["c", "support"] == 0 and got.loc["c", "precision"] == 0.0


def test_pair_metrics_joins_truth(spark, scored_pdf):
    n = len(scored_pdf)
    pairs = spark.createDataFrame(
        pd.DataFrame(
            {
                "id_a": [f"a{i}" for i in range(n)],
                "id_b": [f"b{i}" for i in range(n)],
                "prediction": scored_pdf["prediction"],
            }
        )
    )
    truth = spark.createDataFrame(
        pd.DataFrame(
            {
                "id_a": [f"a{i}" for i in range(n)],
                "id_b": [f"b{i}" for i in range(n)],
                "label": scored_pdf["label"],
            }
        )
    )
    direct = classification_summary(spark.createDataFrame(scored_pdf)).first()
    via_pairs = pair_metrics(pairs, truth).first()
    assert via_pairs["accuracy"] == pytest.approx(direct["accuracy"])
    assert via_pairs["macro_f1"] == pytest.approx(direct["macro_f1"])
