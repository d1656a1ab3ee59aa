"""SPN gate-recurrent 2-D propagation (the reference's only CUDA op).

Parity target: dmb/ops/spn/src/gaterecurrent2dnoind_kernel.cu:130-533 and
the wrappers in dmb/ops/spn/{functions,modules}/gaterecurrent2dnoind.py.

Semantics (left->right, the direction AnyNet uses): sweeping column by
column,
  H[b,h,w,c] = (1 - G1 - G2 - G3)[b,h,w,c] * X[b,h,w,c]
             + G1[b,h,w,c] * H[b,h-1,w-1,c]     (upper-left neighbor)
             + G2[b,h,w,c] * H[b,h,  w-1,c]     (left neighbor)
             + G3[b,h,w,c] * H[b,h+1,w-1,c]     (lower-left neighbor)
with zeros outside the frame. The other three directions are the same scan
on a flipped/transposed tensor.

TPU-native design: the recurrence is sequential in w but dense in (b,h,c),
so a lax.scan over columns with [B, H, C] carries keeps the VPU busy;
autodiff through scan replaces the reference's 400-line handwritten
backward kernel. The recurrence is linear in H, so a Pallas
block-parallel / associative-scan formulation is a future optimization —
this implementation is the correctness reference for it.
"""

import jax
import jax.numpy as jnp


def _scan_left_right(x, g1, g2, g3):
    """All inputs [B, H, W, C]; returns H of the same shape."""
    b, h, w, c = x.shape
    keep = 1.0 - g1 - g2 - g3

    def shift_down(col):  # value at row h comes from row h-1
        return jnp.pad(col, ((0, 0), (1, 0), (0, 0)))[:, :h, :]

    def shift_up(col):    # value at row h comes from row h+1
        return jnp.pad(col, ((0, 0), (0, 1), (0, 0)))[:, 1:, :]

    # scan over width: inputs [W, B, H, C]
    xs = jnp.moveaxis(keep * x, 2, 0), jnp.moveaxis(g1, 2, 0), \
        jnp.moveaxis(g2, 2, 0), jnp.moveaxis(g3, 2, 0)

    def step(h_prev, inp):
        kx, gg1, gg2, gg3 = inp
        h_new = kx + gg1 * shift_down(h_prev) + gg2 * h_prev + \
            gg3 * shift_up(h_prev)
        return h_new, h_new

    init = jnp.zeros((b, h, c), x.dtype)
    _, out = jax.lax.scan(step, init, xs)
    return jnp.moveaxis(out, 0, 2)


def gate_recurrent_2d(x, g1, g2, g3, horizontal=True, reverse=False):
    """Gated linear 2-D propagation over [B, H, W, C] tensors.

    Args:
      x: input features.
      g1, g2, g3: gates for the three trailing diagonal neighbors
        (up-stream-left/center/right of the sweep direction).
      horizontal: sweep along width (True) or height (False).
      reverse: sweep from the far edge backwards.
    """
    flips = []
    if horizontal and reverse:
        flips = [2]
    elif not horizontal:
        # transpose the sweep axis into the width slot
        x, g1, g2, g3 = (jnp.swapaxes(t, 1, 2) for t in (x, g1, g2, g3))
        if reverse:
            flips = [2]
    if flips:
        x, g1, g2, g3 = (jnp.flip(t, flips) for t in (x, g1, g2, g3))

    out = _scan_left_right(x, g1, g2, g3)

    if flips:
        out = jnp.flip(out, flips)
    if not horizontal:
        out = jnp.swapaxes(out, 1, 2)
    return out


def normalize_gates(g1, g2, g3, eps=1e-8):
    """Scale gates so |G1|+|G2|+|G3| <= 1 per pixel (model stability;
    disp_refinement/AnyNet.py:73-78)."""
    s = jnp.abs(g1) + jnp.abs(g2) + jnp.abs(g3)
    return g1 / (s + eps), g2 / (s + eps), g3 / (s + eps)
