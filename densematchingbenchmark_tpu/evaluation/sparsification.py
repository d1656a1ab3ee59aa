"""Sparsification plot: confidence quality via EPE-vs-removal curves.

Parity target: dmb/visualization/stereo/sparsification_plot.py:21-136.
Removes the least-confident X% of pixels and re-measures EPE, against the
oracle (remove largest-error pixels) and a random baseline; a good
confidence estimate tracks the oracle. Numpy implementation (runs on eval
results, not in the train hot path).
"""

import numpy as np


def _norm(x):
    rng = x.max() - x.min()
    x = x / (rng if rng > 0 else 1.0)
    return x * 0.9 + 0.05


def sparsification_plot(est_disp, gt_disp, est_conf, bins=10, lb=None,
                        ub=None, seed=0):
    """Returns {'est_P': epe, 'oracle_P': epe, 'random_P': epe} for each
    removed percentage P in {0, 100/bins, ...} (excluding 100)."""
    assert 100 % bins == 0
    est = np.asarray(est_disp, np.float64).ravel()
    gt = np.asarray(gt_disp, np.float64).ravel()
    conf = np.asarray(est_conf, np.float64).ravel()

    part = 100 // bins
    out = {}
    for i in range(bins + 1):
        for k in ("est", "oracle", "random"):
            out[f"{k}_{part * i}"] = 0.0

    mask = np.ones(gt.shape, bool)
    if lb is not None:
        mask &= gt > lb
    if ub is not None:
        mask &= gt < ub
    n_valid = int(mask.sum())
    if n_valid < bins:
        return out

    abs_error = np.abs(gt - est) * mask
    # higher = keep longer; invalid pixels forced below every threshold
    keys = {
        "est": np.where(mask, _norm(conf), -1.0),
        "oracle": np.where(mask, 1.0 - _norm(abs_error), -1.0),
        "random": np.where(mask, _norm(
            np.random.RandomState(seed).rand(*gt.shape)), -1.0),
    }

    n_invalid = gt.size - n_valid
    step = (n_valid - 1) // bins
    for name, key in keys.items():
        order = np.sort(key)
        for i in range(bins):
            thresh = order[n_invalid + step * i]
            keep = key >= thresh
            out[f"{name}_{part * i}"] = float(
                (abs_error * keep).sum() / max(keep.sum(), 1))
    return out
