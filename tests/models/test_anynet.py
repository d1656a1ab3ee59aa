"""AnyNet meta-architecture tests."""

import numpy as np
import jax
import jax.numpy as jnp

from densematchingbenchmark_tpu.configs import get_config
from densematchingbenchmark_tpu.models import build_model
from densematchingbenchmark_tpu.losses import make_loss_evaluator
from densematchingbenchmark_tpu.losses.builder import total_loss

B, H, W = 1, 64, 64


def test_anynet_forward_and_params():
    cfg = get_config("AnyNet/scene_flow",
                     **{"model.cost_processor.cost_computation.max_disp":
                        dict(init_guess=4, warp_level_8=5, warp_level_4=5)})
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    right = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(variables["params"]))
    # reference AnyNet: 46.987K params (BASELINE.md); init_guess D differs
    # only in activations, so count must land in the same ballpark
    assert 40e3 < n_params < 55e3, n_params

    out = model.apply(variables, left, right, train=False)
    # best-first: [refined_4x, disp_4, disp_8, disp_16], all full-res
    assert len(out["disps"]) == 4
    for d in out["disps"]:
        assert d.shape == (B, H, W, 1)
        assert np.isfinite(np.asarray(d)).all()
    assert len(out["costs"]) == 3

    gt = jnp.asarray(rng.rand(B, H, W, 1) * 30 + 1, jnp.float32)
    evaluator = make_loss_evaluator(cfg["model"]["losses"], sparse=False)

    def loss_fn(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            left, right, train=True, mutable=["batch_stats"])
        return total_loss(evaluator(o["disps"], None, gt))

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # gradient flows through all stages including the SPN refinement
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    spn_grads = [g for path, g in flat
                 if "AnyNetRefinement" in str(path) or "refinement" in
                 str(path).lower()]
    assert spn_grads and sum(float(jnp.abs(g).sum())
                             for g in spn_grads) > 0
