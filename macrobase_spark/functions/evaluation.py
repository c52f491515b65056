"""Detector-evaluation metrics (reference alexp/.../evaluation/: Curve.java
ROC/PR areas, ConfusionMatrix, Accuracy, FScore, NDCG — SURVEY §2.12).

These are test-harness utilities: scores/labels are collected (bounded eval
sets), the math is numpy. For cluster-scale evaluation, aggregate the
(score, label) histogram first and feed the bin counts here.
"""

from __future__ import annotations

import numpy as np


def _rank_order(scores: np.ndarray) -> np.ndarray:
    return np.argsort(-np.asarray(scores, dtype=np.float64), kind="stable")


def roc_curve(scores, labels) -> tuple[np.ndarray, np.ndarray]:
    """(fpr, tpr) at every distinct threshold, descending score order."""
    scores = np.asarray(scores, dtype=np.float64)
    labels = np.asarray(labels, dtype=np.int64)
    order = _rank_order(scores)
    s, y = scores[order], labels[order]
    distinct = np.r_[np.where(np.diff(s))[0], s.size - 1]
    tps = np.cumsum(y)[distinct]
    fps = np.cumsum(1 - y)[distinct]
    P, N = max(y.sum(), 1), max((1 - y).sum(), 1)
    return np.r_[0.0, fps / N], np.r_[0.0, tps / P]


def roc_auc(scores, labels) -> float:
    fpr, tpr = roc_curve(scores, labels)
    trapz = getattr(np, "trapezoid", None) or np.trapz
    return float(trapz(tpr, fpr))


def pr_auc(scores, labels) -> float:
    """Area under precision-recall, step-wise (as the reference's Curve)."""
    scores = np.asarray(scores, dtype=np.float64)
    labels = np.asarray(labels, dtype=np.int64)
    order = _rank_order(scores)
    s, y = scores[order], labels[order]
    distinct = np.r_[np.where(np.diff(s))[0], s.size - 1]
    tps = np.cumsum(y)[distinct]
    fps = np.cumsum(1 - y)[distinct]
    P = max(y.sum(), 1)
    precision = tps / np.maximum(tps + fps, 1)
    recall = tps / P
    prev_r, area = 0.0, 0.0
    for p, r in zip(precision, recall):
        area += p * (r - prev_r)
        prev_r = r
    return float(area)


def confusion_matrix(pred, labels) -> dict[str, int]:
    pred = np.asarray(pred, dtype=np.int64)
    labels = np.asarray(labels, dtype=np.int64)
    return {
        "tp": int(((pred == 1) & (labels == 1)).sum()),
        "fp": int(((pred == 1) & (labels == 0)).sum()),
        "fn": int(((pred == 0) & (labels == 1)).sum()),
        "tn": int(((pred == 0) & (labels == 0)).sum()),
    }


def accuracy(pred, labels) -> float:
    cm = confusion_matrix(pred, labels)
    n = sum(cm.values())
    return (cm["tp"] + cm["tn"]) / n if n else 0.0


def f_score(pred, labels, beta: float = 1.0) -> float:
    """F_beta (reference alexp/.../evaluation/FScore.java:14-16)."""
    cm = confusion_matrix(pred, labels)
    prec = cm["tp"] / max(cm["tp"] + cm["fp"], 1)
    rec = cm["tp"] / max(cm["tp"] + cm["fn"], 1)
    denom = beta * beta * prec + rec
    return (1 + beta * beta) * prec * rec / denom if denom else 0.0


def ndcg_at_k(scores, labels, k: int) -> float:
    """NDCG@k with binary relevance (reference alexp/.../evaluation/NDCG.java:19-48)."""
    labels = np.asarray(labels, dtype=np.float64)
    order = _rank_order(np.asarray(scores, dtype=np.float64))
    rel = labels[order][:k]
    discounts = 1.0 / np.log2(np.arange(2, len(rel) + 2))
    dcg = float((rel * discounts).sum())
    ideal = np.sort(labels)[::-1][:k]
    idcg = float((ideal * discounts[: len(ideal)]).sum())
    return dcg / idcg if idcg else 0.0


def nab_score(
    flags,
    labels,
    tp_weight: float = 1.0,
    fp_weight: float = 0.11,
    fn_weight: float = 1.0,
) -> float:
    """Numenta-style anomaly benchmark score (reference alexp/.../
    evaluation/NabScore.java, the "crude" position-free variant): skipping
    the first 10% probation period, the FIRST detection inside a label
    window scores +tp_weight, detections outside any window score
    -fp_weight each, and an undetected window scores -fn_weight at its
    close."""
    flags = np.asarray(flags, dtype=bool)
    labels = np.asarray(labels, dtype=np.int64)
    tp = fp = fn = 0.0
    window_handled = False
    for i in range(len(flags) // 10, len(flags)):
        if flags[i]:
            if labels[i] == 1 and not window_handled:
                tp += tp_weight
                window_handled = True
            if labels[i] == 0:
                fp -= fp_weight
        prev = labels[i - 1] if i > 0 else 0  # no wrap-around at i==0
        if labels[i] == 0 and prev == 1:
            if not window_handled:
                fn -= fn_weight
            window_handled = False
    # a window still open at end-of-sequence never hits the close condition
    if len(labels) and labels[-1] == 1 and not window_handled:
        fn -= fn_weight
    return tp + fp + fn
