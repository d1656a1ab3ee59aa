"""Tests for infra utils: env dump, loss scaling, metrics formatting."""

import numpy as np
import jax
import jax.numpy as jnp

from densematchingbenchmark_tpu.utils.collect_env import (collect_env_info,
                                                          device_memory_stats)
from densematchingbenchmark_tpu.utils.mixed_precision import (
    DynamicLossScale, all_finite, select_tree)
from densematchingbenchmark_tpu.evaluation.format import (
    metrics_table, combine_shard_metrics)


def test_collect_env():
    info = collect_env_info()
    assert "jax:" in info and "backend: cpu" in info
    assert isinstance(device_memory_stats(), dict)


def test_dynamic_loss_scale():
    scale = DynamicLossScale.create(1024.0, growth_interval=2)
    # non-finite halves
    scale = scale.update(jnp.bool_(False))
    assert float(scale.value) == 512.0
    # two finite steps grow
    scale = scale.update(jnp.bool_(True))
    scale = scale.update(jnp.bool_(True))
    assert float(scale.value) == 1024.0
    # never below 1
    s = DynamicLossScale.create(1.0)
    s = s.update(jnp.bool_(False))
    assert float(s.value) == 1.0

    # jit-safe
    @jax.jit
    def step(s, ok):
        return s.update(ok)
    s2 = step(scale, jnp.bool_(True))
    assert np.isfinite(float(s2.value))


def test_all_finite_and_select():
    good = {"a": jnp.ones(3), "b": jnp.zeros(2)}
    bad = {"a": jnp.array([1.0, jnp.nan, 1.0]), "b": jnp.zeros(2)}
    assert bool(all_finite(good))
    assert not bool(all_finite(bad))
    sel = select_tree(jnp.bool_(False), bad, good)
    assert bool(all_finite(sel))


def test_metrics_table():
    results = {"disp_0/epe": 1.1, "disp_0/occ_epe": 2.0,
               "disp_0/noc_1px": 5.0, "disp_1/epe": 1.3}
    table = metrics_table(results)
    assert "disp_0" in table and "all/epe" in table


def test_combine_shard_metrics_single_process():
    avg, n = combine_shard_metrics({"epe": 1.5}, 10)
    assert avg == {"epe": 1.5} and n == 10


def test_paramwise_lr_multipliers():
    import optax
    from densematchingbenchmark_tpu.trainer.optim import build_optimizer
    cfg = {"optimizer": {"type": "sgd", "lr": 1.0, "momentum": 0.0,
                         "paramwise_options": {"bias_lr_mult": 0.5,
                                               "norm_lr_mult": 0.0}},
           "lr_schedule": {}}
    tx, _ = build_optimizer(cfg, steps_per_epoch=10)
    params = {"conv": {"kernel": jnp.ones(3), "bias": jnp.ones(3)},
              "BatchNorm_0": {"scale": jnp.ones(3)}}
    grads = jax.tree.map(jnp.ones_like, params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(updates["conv"]["kernel"], -1.0)
    np.testing.assert_allclose(updates["conv"]["bias"], -0.5)
    np.testing.assert_allclose(updates["BatchNorm_0"]["scale"], 0.0)
