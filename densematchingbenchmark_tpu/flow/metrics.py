"""Optical-flow error metrics (EPE + n-px, sparse-aware).

Parity target: dmb/data/datasets/evaluation/flow/pixel_error.py:9-88 —
endpoint error over the 2-channel flow with NaN masking and (for sparse GT)
zero-flow masking.
"""

import jax.numpy as jnp

PX_THRESHOLDS = (1, 2, 3, 5)


def calc_flow_error(est_flow, gt_flow, sparse=False):
    """est/gt: [..., H, W, 2]. Returns {'{n}px': %, 'epe': mean}."""
    gt_u, gt_v = gt_flow[..., 0], gt_flow[..., 1]
    est_u, est_v = est_flow[..., 0], est_flow[..., 1]
    mask = ~(jnp.isnan(gt_u) | jnp.isnan(gt_v))
    if sparse:
        mask = mask & ~((jnp.abs(gt_u) < 1e-12) & (jnp.abs(gt_v) < 1e-12))
    maskf = mask.astype(jnp.float32)
    total = jnp.sum(maskf)
    denom = jnp.maximum(total, 1.0)
    any_valid = (total >= 1.0).astype(jnp.float32)

    gt_u = jnp.nan_to_num(gt_u) * maskf
    gt_v = jnp.nan_to_num(gt_v) * maskf
    epe_map = jnp.sqrt((gt_u - est_u * maskf) ** 2 +
                       (gt_v - est_v * maskf) ** 2)
    out = {}
    for t in PX_THRESHOLDS:
        frac = jnp.sum(((epe_map > t) & mask).astype(jnp.float32)) / denom
        out[f"{t}px"] = frac * 100.0 * any_valid
    out["epe"] = jnp.sum(epe_map * maskf) / denom * any_valid
    return out
