"""Golden tests for the SPN gate-recurrent 2-D scan."""

import numpy as np
import jax
import jax.numpy as jnp

from densematchingbenchmark_tpu.ops.spn import (gate_recurrent_2d,
                                                normalize_gates)


def naive_left_right(x, g1, g2, g3):
    """Direct transliteration of the CUDA forward recurrence
    (gaterecurrent2dnoind_kernel.cu:130-163) on [B, H, W, C]."""
    b, h, w, c = x.shape
    out = np.zeros_like(x)

    def H(bb, hh, ww, cc):
        if hh < 0 or hh >= h or ww < 0:
            return 0.0
        return out[bb, hh, ww, cc]

    for bb in range(b):
        for ww in range(w):
            for hh in range(h):
                for cc in range(c):
                    keep = 1 - g1[bb, hh, ww, cc] - g2[bb, hh, ww, cc] - \
                        g3[bb, hh, ww, cc]
                    out[bb, hh, ww, cc] = (
                        keep * x[bb, hh, ww, cc]
                        + g1[bb, hh, ww, cc] * H(bb, hh - 1, ww - 1, cc)
                        + g2[bb, hh, ww, cc] * H(bb, hh, ww - 1, cc)
                        + g3[bb, hh, ww, cc] * H(bb, hh + 1, ww - 1, cc))
    return out


def make_inputs(seed=0, b=2, h=5, w=6, c=3):
    rng = np.random.RandomState(seed)
    x = rng.randn(b, h, w, c).astype(np.float32)
    g1, g2, g3 = (rng.rand(b, h, w, c).astype(np.float32) * 0.5
                  for _ in range(3))
    g1, g2, g3 = (np.asarray(g) for g in normalize_gates(
        jnp.asarray(g1), jnp.asarray(g2), jnp.asarray(g3)))
    return x, g1, g2, g3


def test_matches_naive_recurrence():
    x, g1, g2, g3 = make_inputs()
    got = np.asarray(gate_recurrent_2d(x, g1, g2, g3))
    want = naive_left_right(x, g1, g2, g3)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_directions_are_flips():
    x, g1, g2, g3 = make_inputs(seed=1)
    lr = np.asarray(gate_recurrent_2d(x, g1, g2, g3, True, False))
    rl = np.asarray(gate_recurrent_2d(
        x[:, :, ::-1], g1[:, :, ::-1], g2[:, :, ::-1], g3[:, :, ::-1],
        True, True))
    np.testing.assert_allclose(rl[:, :, ::-1], lr, atol=1e-5)

    tb = np.asarray(gate_recurrent_2d(
        np.swapaxes(x, 1, 2), np.swapaxes(g1, 1, 2), np.swapaxes(g2, 1, 2),
        np.swapaxes(g3, 1, 2), False, False))
    np.testing.assert_allclose(np.swapaxes(tb, 1, 2), lr, atol=1e-5)


def test_stability_bound():
    """With normalized gates and bounded input, the output stays bounded
    (the SPN stability condition, disp_refinement/AnyNet.py:73-74)."""
    rng = np.random.RandomState(2)
    x = rng.uniform(-1, 1, (1, 16, 200, 2)).astype(np.float32)
    g = [rng.uniform(-2, 2, x.shape).astype(np.float32) for _ in range(3)]
    g1, g2, g3 = normalize_gates(*map(jnp.asarray, g))
    out = np.asarray(gate_recurrent_2d(x, g1, g2, g3))
    # |G1|+|G2|+|G3| = s <= 1 bounds the fixed point by (1+s)/(1-s); with
    # random signs the practical magnitude stays small — assert no
    # exponential blow-up over 200 columns
    assert np.isfinite(out).all()
    assert np.abs(out).max() <= 50.0


def test_grad_flows():
    x, g1, g2, g3 = make_inputs(seed=3)

    def f(x, g1, g2, g3):
        return jnp.sum(gate_recurrent_2d(x, g1, g2, g3) ** 2)

    grads = jax.grad(f, argnums=(0, 1, 2, 3))(
        *map(jnp.asarray, (x, g1, g2, g3)))
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0
