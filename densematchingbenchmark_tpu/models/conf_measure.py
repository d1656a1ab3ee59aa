"""Classical confidence measures from cost volumes + GT conf generation.

Parity targets:
  dmb/modeling/stereo/cmn/cal_conf.py (or conf_measure/cal_conf.py:8-133):
    peak detection via the gradient-sign trick, PKR / APKR / NLM measures.
  dmb/modeling/stereo/conf_measure/gen_conf.py:5-52: GT confidence label
    |est - gt| < theta.
  dmb/modeling/stereo/conf_measure/conf_net.py:8-36: standalone learned
    confidence head == models/cmn.py:ConfHead.
"""

import jax.numpy as jnp

EPS = 1e-12


def _local_peaks(cost_volume):
    """(c1, c2): largest and second-largest *convex-peak* values per pixel.

    cost_volume: [B, D, H, W], higher = more similar. Peaks are found by the
    reference's gradient-sign trick (cal_conf.py:34-77): a D-position is a
    peak iff the discrete gradient is positive into it and negative out.
    """
    cv = cost_volume - jnp.min(cost_volume, axis=1, keepdims=True)
    padded = jnp.pad(cv, ((0, 0), (1, 0), (0, 0), (0, 0)))
    grad = padded[:, 1:] - padded[:, :-1]               # [B, D, H, W]
    pos = grad > 0
    neg_shift = jnp.pad((grad < 0)[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)),
                        constant_values=True)
    is_peak = pos & neg_shift
    peak_vals = cv * is_peak.astype(cv.dtype)
    c1 = jnp.max(peak_vals, axis=1, keepdims=True)
    removed = peak_vals * (peak_vals < c1).astype(cv.dtype)
    c2 = jnp.max(removed, axis=1, keepdims=True)
    return c1, c2


def pkr_confidence(cost_volume):
    """Peak-ratio confidence: 1 - |c2/c1|, in [0, 1] -> [B, 1, H, W]."""
    c1, c2 = _local_peaks(cost_volume)
    return 1.0 - jnp.abs((c2 + EPS) / (c1 + EPS))


def apkr_confidence(cost_volume, kernel_size=3):
    """Average peak-ratio: PKR box-filtered with a kernel_size window."""
    conf = pkr_confidence(cost_volume)[:, 0]            # [B, H, W]
    k = kernel_size
    p = k // 2
    padded = jnp.pad(conf, ((0, 0), (p, p), (p, p)))
    out = jnp.zeros_like(conf)
    for dy in range(k):
        for dx in range(k):
            out = out + padded[:, dy:dy + conf.shape[1],
                               dx:dx + conf.shape[2]]
    return jnp.clip(out / (k * k), 0.0, 1.0)[:, None]


def nlm_confidence(cost_volume, sigma=2.0):
    """Non-linear margin: exp((c2 - c1)... ) — exp(-(c2-c1)/sigma^2)."""
    c1, c2 = _local_peaks(cost_volume)
    return jnp.exp(-(c2 - c1) / (sigma ** 2))


def generate_gt_confidence(est_disp, gt_disp, theta=1.0, lb=None, ub=None):
    """GT confidence label: 1 where |est - gt| < theta on valid GT.

    Parity: conf_measure/gen_conf.py:5-52. Returns a float mask shaped like
    the inputs.
    """
    valid = jnp.ones(gt_disp.shape, bool)
    if lb is not None:
        valid = valid & (gt_disp > lb)
    if ub is not None:
        valid = valid & (gt_disp < ub)
    conf = (jnp.abs(est_disp - gt_disp) < theta) & valid
    return conf.astype(jnp.float32)
