"""Every registered config builds a model that initializes (tiny shapes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from densematchingbenchmark_tpu.configs import CONFIGS, get_config
from densematchingbenchmark_tpu.models import build_model

MAXD = 32


def tiny_overrides(name, cfg):
    over = {"model.max_disp": MAXD}
    m = cfg["model"]
    if m["meta_architecture"] == "GeneralizedStereoModel":
        comp = m["cost_processor"]["cost_computation"]
        scale = 192 // comp["max_disp"]
        over["model.cost_processor.cost_computation.max_disp"] = MAXD // scale
        over["model.cost_processor.cost_aggregator.max_disp"] = MAXD
        pred_scale = 192 // m["disp_predictor"]["max_disp"]
        over["model.disp_predictor.max_disp"] = MAXD // pred_scale
        if "cmn" in m:
            over["model.cmn.in_planes"] = MAXD
    elif m["meta_architecture"] == "AnyNet":
        over["model.cost_processor.cost_computation.max_disp"] = dict(
            init_guess=MAXD // 16, warp_level_8=5, warp_level_4=5)
    elif m["meta_architecture"] == "DeepPruner":
        over["model.disp_sampler.max_disp"] = MAXD // m["scale"]
        over["model.disp_sampler.iterations"] = 1
    return over


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_config_builds_and_inits(name):
    if name.split("/")[0] in ("DeepPruner", "AnyNet"):
        # init alone costs minutes of CPU compile; these families have
        # dedicated full forward/backward tests (test_deeppruner/test_anynet)
        pytest.skip("covered by dedicated family tests")
    if name.endswith("_bf16") or name.endswith("_f32"):
        # dtype-only wrappers of the base configs; one representative below
        if name != "PSMNet/scene_flow_bf16":
            pytest.skip("dtype-only variant of the base config")
    cfg = get_config(name)
    cfg = get_config(name, **tiny_overrides(name, cfg))
    model = build_model(cfg)
    left = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), left, left, train=False)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(variables["params"]))
    assert n_params > 1e4, f"{name}: suspiciously few params ({n_params})"


def test_default_dtype_is_backend_conditional(monkeypatch):
    """get_config() ships the backend's measured-best precision: bf16 on
    TPU (mirroring the reference's always-on apex O1), f32 on CPU; the
    _f32/_bf16 suffixes and explicit model.dtype pin it."""
    # tests run on the CPU backend (conftest) -> f32 default
    monkeypatch.delenv("DMB_DEFAULT_DTYPE", raising=False)
    assert get_config("PSMNet/scene_flow")["model"]["dtype"] == "float32"
    # TPU backends resolve to bf16 (simulated via the env override the
    # resolver consults before probing the backend)
    monkeypatch.setenv("DMB_DEFAULT_DTYPE", "bfloat16")
    assert get_config("PSMNet/scene_flow")["model"]["dtype"] == "bfloat16"
    # pinned names/overrides win over the backend default
    assert get_config("PSMNet/scene_flow_f32")["model"]["dtype"] == "float32"
    assert get_config("PSMNet/scene_flow",
                      **{"model.dtype": "float32"})["model"]["dtype"] == \
        "float32"
    monkeypatch.delenv("DMB_DEFAULT_DTYPE")
    assert get_config("PSMNet/scene_flow_bf16")["model"]["dtype"] == \
        "bfloat16"
