"""Flow-aware transforms (numpy).

Parity target: dmb/data/transforms/flow_trans.py — geometric augmentations
must transform the flow *values*, not just the flow map: horizontal flip
negates u, vertical flip negates v, scaling multiplies the vectors, etc.
"""

import numpy as np

_IMG_KEYS = ("leftImage", "rightImage")


def random_crop(sample, size, rng):
    h, w = sample["leftImage"].shape[:2]
    th, tw = size
    y1 = int(rng.integers(0, h - th + 1))
    x1 = int(rng.integers(0, w - tw + 1))
    out = dict(sample)
    for k in _IMG_KEYS + ("flow",):
        if sample.get(k) is not None:
            out[k] = sample[k][y1:y1 + th, x1:x1 + tw]
    return out


def random_horizontal_flip(sample, rng, prob=0.5):
    if rng.random() >= prob:
        return sample
    out = dict(sample)
    for k in _IMG_KEYS:
        out[k] = sample[k][:, ::-1].copy()
    if sample.get("flow") is not None:
        flow = sample["flow"][:, ::-1].copy()
        flow[..., 0] *= -1.0
        out["flow"] = flow
    return out


def random_vertical_flip(sample, rng, prob=0.5):
    if rng.random() >= prob:
        return sample
    out = dict(sample)
    for k in _IMG_KEYS:
        out[k] = sample[k][::-1].copy()
    if sample.get("flow") is not None:
        flow = sample["flow"][::-1].copy()
        flow[..., 1] *= -1.0
        out["flow"] = flow
    return out


def scale(sample, factor):
    """Resize images and flow by ``factor``; flow values scale with it."""
    from ..ops.interpolate import resize_linear
    import jax.numpy as jnp
    out = dict(sample)
    h, w = sample["leftImage"].shape[:2]
    nh, nw = int(round(h * factor)), int(round(w * factor))
    for k in _IMG_KEYS:
        out[k] = np.asarray(resize_linear(
            jnp.asarray(sample[k])[None], (nh, nw), (1, 2),
            align_corners=False))[0]
    if sample.get("flow") is not None:
        f = np.asarray(resize_linear(
            jnp.asarray(sample["flow"])[None], (nh, nw), (1, 2),
            align_corners=False))[0]
        out["flow"] = f * factor
    return out


def normalize(sample, mean, std):
    out = dict(sample)
    for k in _IMG_KEYS:
        out[k] = (sample[k] - np.asarray(mean, np.float32)) / \
            np.asarray(std, np.float32)
    return out


def pad_to(sample, size):
    """Bottom/right zero-pad images and flow to ``size`` (flow padded with
    NaN so the loss/metrics mask it out)."""
    th, tw = size
    h, w = sample["leftImage"].shape[:2]
    assert th >= h and tw >= w, ((h, w), size)
    out = dict(sample)
    for k in _IMG_KEYS:
        out[k] = np.pad(sample[k], ((0, th - h), (0, tw - w), (0, 0)))
    if sample.get("flow") is not None:
        out["flow"] = np.pad(sample["flow"],
                             ((0, th - h), (0, tw - w), (0, 0)),
                             constant_values=np.nan)
    return out


def make_train_transform(input_shape, mean, std):
    def apply(sample, rng):
        sample = random_crop(sample, input_shape, rng)
        return normalize(sample, mean, std)
    return apply


def make_eval_transform(input_shape, mean, std):
    def apply(sample, rng=None):
        sample = pad_to(sample, input_shape)
        return normalize(sample, mean, std)
    return apply
