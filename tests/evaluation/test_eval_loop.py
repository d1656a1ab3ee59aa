"""Batched/bucketed eval equals the per-sample loop exactly.

Parity target: reference tools/test.py:101-169 evaluates batch-1 per
sample; the TPU path batches N samples per dispatch (shape-bucketed) and
must average identically (mean of per-sample metric means)."""

import numpy as np
import jax
import jax.numpy as jnp

from densematchingbenchmark_tpu.configs import get_config
from densematchingbenchmark_tpu.models import build_model
from densematchingbenchmark_tpu.data import SyntheticStereoDataset, transforms
from densematchingbenchmark_tpu.evaluation.eval_loop import evaluate
from densematchingbenchmark_tpu.evaluation.metrics import calc_error


def test_calc_error_per_sample_matches_scalar():
    rng = np.random.RandomState(0)
    est = jnp.asarray(rng.rand(3, 16, 24, 1) * 40, jnp.float32)
    gt = jnp.asarray(rng.rand(3, 16, 24, 1) * 40, jnp.float32)
    vec = calc_error(est, gt, lb=0, ub=32, per_sample=True)
    for b in range(3):
        one = calc_error(est[b:b + 1], gt[b:b + 1], lb=0, ub=32)
        for k in one:
            np.testing.assert_allclose(np.asarray(vec[k])[b],
                                       np.asarray(one[k]), rtol=1e-6)


def _tiny_stereonet():
    return get_config(
        "StereoNet/scene_flow_8x_2stage",
        **{"model.max_disp": 32, "model.dtype": "float32",
           "model.cost_processor.cost_computation.max_disp": 4,
           "model.cost_processor.cost_aggregator.max_disp": 32,
           "model.disp_predictor.max_disp": 4,
           "model.losses.l1_loss.max_disp": 32})


def test_batched_eval_matches_batch1():
    cfg = _tiny_stereonet()
    model = build_model(cfg)
    mean, std = cfg["data"]["mean"], cfg["data"]["std"]
    ds = SyntheticStereoDataset(length=7, height=64, width=128, max_disp=24)
    ds.transform = transforms.make_eval_transform((64, 128), mean, std)

    dummy = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy, train=False)
    eval_cfg = {"lower_bound": 0, "upper_bound": 32}

    r1, n1 = evaluate(model, variables, ds, eval_cfg, batch_size=1)
    # 7 samples / batch 3 -> buckets flush at 3, 3, then a natural-size 1
    r3, n3 = evaluate(model, variables, ds, eval_cfg, batch_size=3)
    assert n1 == n3 == 7
    assert set(r1) == set(r3) and "disp_0/epe" in r1
    for k in r1:
        np.testing.assert_allclose(r3[k], r1[k], rtol=1e-5, atol=1e-5,
                                   err_msg=k)


def test_batched_eval_buckets_heterogeneous_shapes():
    cfg = _tiny_stereonet()
    model = build_model(cfg)
    mean, std = cfg["data"]["mean"], cfg["data"]["std"]

    class MixedDataset:
        """Two padded shapes interleaved (KITTI-style heterogeneity)."""

        def __init__(self):
            self.a = SyntheticStereoDataset(length=3, height=64, width=128,
                                            max_disp=24)
            self.a.transform = transforms.make_eval_transform(
                (64, 128), mean, std)
            self.b = SyntheticStereoDataset(length=3, height=64, width=160,
                                            max_disp=24, seed=1)
            self.b.transform = transforms.make_eval_transform(
                (64, 160), mean, std)

        def __len__(self):
            return 6

        def __getitem__(self, i, rng=None):
            src = self.a if i % 2 == 0 else self.b
            return src.__getitem__(i // 2, rng=rng)

    ds = MixedDataset()
    dummy = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy, train=False)
    eval_cfg = {"lower_bound": 0, "upper_bound": 32}
    r1, n1 = evaluate(model, variables, ds, eval_cfg, batch_size=1)
    r2, n2 = evaluate(model, variables, ds, eval_cfg, batch_size=2)
    assert n1 == n2 == 6
    for k in r1:
        np.testing.assert_allclose(r2[k], r1[k], rtol=1e-5, atol=1e-5,
                                   err_msg=k)


def test_eval_raises_on_dataset_read_error():
    """A corrupt sample mid-eval must fail loudly, not silently truncate
    the averaged sample set (ADVICE r3 medium)."""
    cfg = _tiny_stereonet()
    model = build_model(cfg)
    mean, std = cfg["data"]["mean"], cfg["data"]["std"]
    base = SyntheticStereoDataset(length=5, height=64, width=128,
                                  max_disp=24)
    base.transform = transforms.make_eval_transform((64, 128), mean, std)

    class CorruptDataset:
        def __len__(self):
            return 5

        def __getitem__(self, i, rng=None):
            if i == 3:
                raise IOError("corrupt PFM")
            return base.__getitem__(i, rng=rng)

    dummy = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy, train=False)
    eval_cfg = {"lower_bound": 0, "upper_bound": 32}
    import pytest
    with pytest.raises(IOError, match="corrupt PFM"):
        evaluate(model, variables, CorruptDataset(), eval_cfg, batch_size=2)


def test_patch_match_eval_noise_is_batch_invariant():
    """Eval-time PatchMatch init noise must not depend on batch
    size/composition (ADVICE r3: PRNG-at-eval batch sensitivity)."""
    from densematchingbenchmark_tpu.ops.patch_match import patch_match
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(2, 8, 16, 4), jnp.float32)
    right = jnp.asarray(rng.rand(2, 8, 16, 4), jnp.float32)
    zeros = jnp.zeros((2, 8, 16, 1), jnp.float32)
    key = jax.random.PRNGKey(0)
    both = patch_match(left, right, zeros, zeros + 8.0, key,
                       disparity_sample_number=6, iterations=1,
                       batch_invariant_noise=True)
    for b in range(2):
        one = patch_match(left[b:b + 1], right[b:b + 1], zeros[:1],
                          zeros[:1] + 8.0, key, disparity_sample_number=6,
                          iterations=1, batch_invariant_noise=True)
        np.testing.assert_allclose(np.asarray(both)[b], np.asarray(one)[0],
                                   rtol=1e-6, atol=1e-6)
