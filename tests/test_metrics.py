"""Metrics parity: device confusion matrix vs sklearn; compute_results vs the
reference implementation (imported from /root/reference — numpy only)."""

import sys

import numpy as np
import jax.numpy as jnp
from sklearn.metrics import confusion_matrix as sk_confusion

from paif_tpu.eval import colorize, compute_results, confusion_matrix, scores, summarize

sys.path.insert(0, "/root/reference")


def test_confusion_matrix_matches_sklearn(rng):
    labels = rng.integers(0, 9, (3, 16, 20))
    preds = rng.integers(0, 9, (3, 16, 20))
    got = np.asarray(confusion_matrix(jnp.asarray(labels), jnp.asarray(preds), 9))
    ref = sk_confusion(labels.flatten(), preds.flatten(), labels=list(range(9)))
    np.testing.assert_array_equal(got, ref)


def test_confusion_matrix_ignores_out_of_range(rng):
    labels = rng.integers(0, 9, (2, 8, 8))
    preds = rng.integers(0, 9, (2, 8, 8))
    labels[0, 0, :] = 255  # ignored pixels must not count
    got = np.asarray(confusion_matrix(jnp.asarray(labels), jnp.asarray(preds), 9))
    mask = labels.flatten() < 9
    ref = sk_confusion(labels.flatten()[mask], preds.flatten()[mask], labels=list(range(9)))
    np.testing.assert_array_equal(got, ref)


def test_compute_results_matches_reference(rng):
    from util.util import compute_results as ref_compute

    conf = rng.integers(0, 50, (9, 9)).astype(np.float64)
    conf[:, 3] = 0  # absent predicted class
    conf[5, :] = 0  # absent true class
    p, r, i = compute_results(conf)
    rp, rr, ri = ref_compute(conf)
    np.testing.assert_allclose(p, rp, equal_nan=True)
    np.testing.assert_allclose(r, rr, equal_nan=True)
    np.testing.assert_allclose(i, ri, equal_nan=True)
    s = summarize(conf)
    assert abs(s["iou_mean"] - np.mean(np.nan_to_num(ri))) < 1e-12


def test_scores_matches_reference(rng):
    from utils.eval_seg import scores as ref_scores

    lt = [rng.integers(0, 9, (16, 16)) for _ in range(3)]
    lp = [rng.integers(0, 9, (16, 16)) for _ in range(3)]
    got = scores(lt, lp, 9)
    ref = ref_scores(lt, lp, 9)
    for k in ("Pixel Accuracy", "Mean Accuracy", "Mean IoU"):
        np.testing.assert_allclose(got[k], ref[k])


def test_colorize_palette():
    pred = np.array([[0, 1], [8, 3]])
    img = colorize(pred)
    assert img.shape == (2, 2, 3)
    np.testing.assert_array_equal(img[0, 1], [64, 0, 128])  # car
    np.testing.assert_array_equal(img[1, 0], [192, 64, 0])  # bump
