"""RAFT flow family: build/forward/loss/grad + components.

No reference parity target (the reference's flow registry is empty); these
pin the capability extension: recurrent weight-tied updates under nn.scan,
bounded correlation lookups, convex upsampling.
"""

import numpy as np
import jax
import jax.numpy as jnp

from densematchingbenchmark_tpu.configs import get_config
from densematchingbenchmark_tpu.flow.models import build_flow_model
from densematchingbenchmark_tpu.flow.losses import flow_l1_loss
from densematchingbenchmark_tpu.flow.raft import (all_pairs_corr_pyramid,
                                                  corr_lookup,
                                                  corr_lookup_gather)


def _tiny_cfg(iters=2):
    return get_config(
        "RAFT/flying_chairs",
        **{"model.iters": iters, "model.hidden": 32, "model.context": 16,
           "model.losses.flow_l1_loss.weights":
               (1.0,) + tuple(0.8 ** k for k in range(iters)),
           "model.dtype": "float32"})


def test_corr_pyramid_and_lookup_shapes():
    rng = np.random.RandomState(0)
    fm1 = jnp.asarray(rng.randn(2, 8, 12, 16), jnp.float32)
    fm2 = jnp.asarray(rng.randn(2, 8, 12, 16), jnp.float32)
    pyr = all_pairs_corr_pyramid(fm1, fm2, levels=3)
    assert [p.shape for p in pyr] == [(2, 8, 12, 8, 12), (2, 8, 12, 4, 6),
                                      (2, 8, 12, 2, 3)]
    # zero flow at level 0 samples the identity correspondence exactly
    base = jnp.stack(jnp.meshgrid(jnp.arange(12.0), jnp.arange(8.0)),
                     axis=-1)[None]
    feats = corr_lookup(pyr[:1], jnp.broadcast_to(base, (2, 8, 12, 2)),
                        radius=1)
    assert feats.shape == (2, 8, 12, 9)
    center = np.asarray(feats[..., 4])  # offset (0,0) of the 3x3 window
    want = np.einsum("bhwc,bhwc->bhw", np.asarray(fm1),
                     np.asarray(fm2)) / np.sqrt(16.0)
    np.testing.assert_allclose(center, want, rtol=1e-5, atol=1e-5)


def test_corr_lookup_tent_contraction_matches_gather():
    """The round-5 MXU schedule (two tent-weight contractions) must equal
    the chained gather_1d_linear oracle bit-for-bit in semantics: interior
    coords, fractional coords, and out-of-range window taps (zero-pad)."""
    rng = np.random.RandomState(3)
    fm1 = jnp.asarray(rng.randn(2, 8, 12, 16), jnp.float32)
    fm2 = jnp.asarray(rng.randn(2, 8, 12, 16), jnp.float32)
    pyr = all_pairs_corr_pyramid(fm1, fm2, levels=3)
    # coords spill past every border (x in [-3, 15), y in [-3, 11)) so the
    # 7x7 window exercises fully-out-of-range taps at every level
    coords = jnp.asarray(
        np.stack([rng.rand(2, 8, 12) * 18 - 3,
                  rng.rand(2, 8, 12) * 14 - 3], axis=-1), jnp.float32)
    fast = corr_lookup(pyr, coords, radius=3)
    oracle = corr_lookup_gather(pyr, coords, radius=3)
    assert fast.shape == oracle.shape == (2, 8, 12, 3 * 49)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(oracle),
                               rtol=1e-5, atol=1e-5)


def test_raft_forward_loss_grad():
    cfg = _tiny_cfg(iters=2)
    model = build_flow_model(cfg)
    rng = np.random.RandomState(1)
    ref = jnp.asarray(rng.rand(1, 32, 48, 3), jnp.float32)
    tgt = jnp.asarray(rng.rand(1, 32, 48, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), ref, tgt, train=False)

    out = model.apply(variables, ref, tgt, train=False)
    flows = out["flows"]
    assert len(flows) == 3  # convex-up + 2 iterations
    assert all(f.shape == (1, 32, 48, 2) for f in flows)
    assert all(np.isfinite(np.asarray(f)).all() for f in flows)

    gt = jnp.asarray(rng.rand(1, 32, 48, 2) * 4 - 2, jnp.float32)
    weights = tuple(cfg["model"]["losses"]["flow_l1_loss"]["weights"])

    def loss_fn(params):
        o = model.apply({**variables, "params": params}, ref, tgt,
                        train=True, mutable=["batch_stats"])[0]
        return sum(flow_l1_loss(o["flows"], gt, weights).values())

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(jnp.square(g)))
                for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
    # the weight-tied update block exists ONCE in the param tree (nn.scan
    # broadcast), not once per iteration
    assert "update" in variables["params"]


def test_raft_more_iters_reuses_params():
    """Iteration count is a runtime knob, not a parameter-shape change."""
    m2 = build_flow_model(_tiny_cfg(iters=2))
    m4 = build_flow_model(_tiny_cfg(iters=4))
    rng = np.random.RandomState(2)
    ref = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
    v2 = m2.init(jax.random.PRNGKey(0), ref, ref, train=False)
    out = m4.apply(v2, ref, ref, train=False)  # same tree, more steps
    assert len(out["flows"]) == 5
