"""Segmentation metrics with reference-parity semantics.

The confusion matrix accumulates ON DEVICE (one bincount per batch — the
reference round-trips every image through sklearn on host,
robust_test.py:207-211); only the final 9x9 matrix crosses to host, where
compute_results reproduces util/util.py:31-55 exactly, including NaN for
absent classes and the np.mean(np.nan_to_num(.)) reductions.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def confusion_matrix(labels: jnp.ndarray, preds: jnp.ndarray, num_classes: int = 9) -> jnp.ndarray:
    """(num_classes, num_classes) matrix; rows = truth, cols = prediction.

    Pixels with labels outside [0, num_classes) are ignored — matching both
    sklearn's labels=[0..8] restriction and _fast_hist (utils/eval_seg.py:3-9).
    Device-friendly: a single flattened bincount.
    """
    labels = labels.reshape(-1).astype(jnp.int32)
    preds = preds.reshape(-1).astype(jnp.int32)
    valid = (labels >= 0) & (labels < num_classes) & (preds >= 0) & (preds < num_classes)
    idx = jnp.where(valid, labels * num_classes + preds, num_classes * num_classes)
    counts = jnp.bincount(idx, length=num_classes * num_classes + 1)
    return counts[:-1].reshape(num_classes, num_classes)


def compute_results(conf_total: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(precision, recall, IoU) per class with NaN for absent classes.

    Bit-identical port of util/util.py:31-55 (consider_unlabeled=True).
    """
    conf_total = np.asarray(conf_total, dtype=np.float64)
    n_class = conf_total.shape[0]
    precision = np.zeros(n_class)
    recall = np.zeros(n_class)
    iou = np.zeros(n_class)
    for cid in range(n_class):
        col = conf_total[:, cid].sum()
        row = conf_total[cid, :].sum()
        tp = conf_total[cid, cid]
        precision[cid] = np.nan if col == 0 else tp / col
        recall[cid] = np.nan if row == 0 else tp / row
        denom = row + col - tp
        iou[cid] = np.nan if denom == 0 else tp / denom
    return precision, recall, iou


def summarize(conf_total: np.ndarray) -> Dict[str, float]:
    """Reference-report scalars (robust_test.py:217-239, test_original 243-245)."""
    precision, recall, iou = compute_results(conf_total)
    return {
        "acc_mean": float(np.mean(np.nan_to_num(precision))),
        "iou_mean": float(np.mean(np.nan_to_num(iou))),
        "recall_mean": float(np.mean(np.nan_to_num(recall))),
        # 'remove unlabeled' variants average classes 1..C-1
        "acc_mean_wo_unlabeled": float(np.mean(np.nan_to_num(precision[1:]))),
        "iou_mean_wo_unlabeled": float(np.mean(np.nan_to_num(iou[1:]))),
    }


def scores(
    label_trues: Sequence[np.ndarray], label_preds: Sequence[np.ndarray], num_classes: int = 21
) -> Dict[str, object]:
    """utils/eval_seg.py:11-29 parity: pixel acc / mean acc / mean IoU / class IoU."""
    hist = np.zeros((num_classes, num_classes))
    for lt, lp in zip(label_trues, label_preds):
        lt = np.asarray(lt).flatten()
        lp = np.asarray(lp).flatten()
        mask = (lt >= 0) & (lt < num_classes)
        hist += np.bincount(
            num_classes * lt[mask].astype(int) + lp[mask], minlength=num_classes**2
        ).reshape(num_classes, num_classes)
    with np.errstate(divide="ignore", invalid="ignore"):
        acc = np.diag(hist).sum() / hist.sum()
        acc_cls = np.nanmean(np.diag(hist) / hist.sum(axis=1))
        iu = np.diag(hist) / (hist.sum(axis=1) + hist.sum(axis=0) - np.diag(hist))
        valid = hist.sum(axis=1) > 0
        mean_iu = np.nanmean(iu[valid])
    return {
        "Pixel Accuracy": acc,
        "Mean Accuracy": acc_cls,
        "Mean IoU": mean_iu,
        "Class IoU": dict(zip(range(num_classes), iu)),
    }
