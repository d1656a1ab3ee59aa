"""Stereo sample transforms (numpy, channels-last).

Parity target: dmb/data/transforms/stereo_trans.py:10-119. Samples are dicts
with 'leftImage'/'rightImage' [H, W, 3] and optional 'leftDisp'/'rightDisp'
[H, W, 1], plus 'original_size'. Randomness is explicit (np.random.Generator)
so epoch-seeded determinism (reference DistributedSampler semantics) holds
across hosts.

Pipeline parity (dmb/data/datasets/stereo/builder.py:8-56):
  train: random_crop(input_shape) -> normalize
  eval/test: pad_to(input_shape) (top + right, zeros) -> normalize
"""

import numpy as np

_SPATIAL_KEYS = ("leftImage", "rightImage", "leftDisp", "rightDisp")


def _crop(sample, y1, x1, th, tw):
    out = dict(sample)
    for k in _SPATIAL_KEYS:
        if sample.get(k) is not None:
            out[k] = sample[k][y1:y1 + th, x1:x1 + tw]
    return out


def random_crop(sample, size, rng):
    h, w = sample["leftImage"].shape[:2]
    th, tw = size
    if (h, w) == (th, tw):
        return sample
    y1 = int(rng.integers(0, h - th + 1))
    x1 = int(rng.integers(0, w - tw + 1))
    return _crop(sample, y1, x1, th, tw)


def center_crop(sample, size):
    h, w = sample["leftImage"].shape[:2]
    th, tw = size
    return _crop(sample, (h - th) // 2, (w - tw) // 2, th, tw)


def pad_to(sample, size, pad_disp=False):
    """Pad top and right with zeros to (th, tw).

    The reference StereoPad pads only the images; eval then crops the
    prediction back (remove_padding) and masks GT==0. With ``pad_disp`` the
    GT is zero-padded the same way, which is numerically equivalent (padded
    pixels are invalid under the lb=0 mask) but keeps eval shapes static for
    jit — needed for KITTI where original sizes vary per sample.
    """
    h, w = sample["leftImage"].shape[:2]
    th, tw = size
    if (h, w) == (th, tw):
        return sample
    pad = ((th - h, 0), (0, tw - w), (0, 0))
    out = dict(sample)
    keys = ("leftImage", "rightImage") + (
        ("leftDisp", "rightDisp") if pad_disp else ())
    for k in keys:
        if sample.get(k) is not None:
            out[k] = np.pad(sample[k], pad)
    return out


def normalize(sample, mean, std):
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    out = dict(sample)
    for k in ("leftImage", "rightImage"):
        out[k] = (sample[k] - mean) / std
    return out


def make_train_transform(input_shape, mean, std):
    def apply(sample, rng):
        sample = random_crop(sample, input_shape, rng)
        return normalize(sample, mean, std)
    return apply


def make_eval_transform(input_shape, mean, std, pad_disp=True):
    def apply(sample, rng=None):
        sample = pad_to(sample, input_shape, pad_disp=pad_disp)
        return normalize(sample, mean, std)
    return apply
