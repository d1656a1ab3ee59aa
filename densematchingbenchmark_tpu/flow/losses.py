"""Multi-scale optical-flow training losses (pure functions).

The reference registers no flow models and hence ships no flow losses —
this extends its flow scaffolding, following the framework's stereo loss
conventions (losses/disp_losses.py): per-level weights, GT auto-rescale to
each prediction's resolution (with flow VALUES scaled by the resolution
ratio), NaN/invalid masking, per-level loss dict.
"""

import jax.numpy as jnp


def _rescale_gt_flow(gt_flow, out_h, out_w):
    """Average-pool dense GT flow to (out_h, out_w), scaling values.

    Flow vectors measure pixel displacement, so a map downsampled by s must
    also have its values divided by s (the inverse of the model's
    ``2 * upsample`` pyramid rule).
    """
    b, h, w, _ = gt_flow.shape
    if (h, w) == (out_h, out_w):
        return gt_flow
    assert h % out_h == 0 and w % out_w == 0, ((h, w), (out_h, out_w))
    sh, sw = h // out_h, w // out_w
    pooled = gt_flow.reshape(b, out_h, sh, out_w, sw, 2).mean(axis=(2, 4))
    scale = jnp.array([1.0 / sw, 1.0 / sh], gt_flow.dtype)
    return pooled * scale


def flow_l1_loss(flows, gt_flow, weights, eps=1e-8):
    """Weighted multi-scale robust-L1 (Charbonnier) endpoint loss.

    Args:
      flows: list of [B, h_i, w_i, 2] predictions, best first (the model's
        ``flows`` contract).
      gt_flow: [B, H, W, 2] dense ground truth; NaNs are masked out.
      weights: per-level loss weights, len == len(flows).

    Returns:
      dict {"flow_loss_lvl{i}": scalar}.
    """
    assert len(weights) == len(flows), (len(weights), len(flows))
    losses = {}
    for i, (flow, wt) in enumerate(zip(flows, weights)):
        _, h, w, _ = flow.shape
        gt = _rescale_gt_flow(jnp.nan_to_num(gt_flow), h, w)
        valid = ~jnp.any(jnp.isnan(gt_flow), axis=-1, keepdims=True)
        if valid.shape[1] != h:
            sh, sw = valid.shape[1] // h, valid.shape[2] // w
            b = valid.shape[0]
            valid = valid.astype(jnp.float32).reshape(
                b, h, sh, w, sw, 1).min(axis=(2, 4))
        valid = valid.astype(jnp.float32)
        err = jnp.sqrt(jnp.sum((flow - gt) ** 2, axis=-1, keepdims=True)
                       + eps)
        denom = jnp.maximum(jnp.sum(valid), 1.0)
        losses[f"flow_loss_lvl{i}"] = wt * jnp.sum(err * valid) / denom
    return losses
