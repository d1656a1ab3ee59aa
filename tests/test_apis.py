"""Library inference API tests (init_model / inference_stereo)."""

import numpy as np

from densematchingbenchmark_tpu.apis import init_model, inference_stereo
from densematchingbenchmark_tpu.configs import get_config


def small_cfg():
    return get_config(
        "StereoNet/scene_flow_8x_2stage",
        **{"model.max_disp": 32,
           "model.cost_processor.cost_computation.max_disp": 4,
           "model.disp_predictor.max_disp": 4,
           "model.losses.l1_loss.max_disp": 32,
           "data.test.input_shape": (64, 64)})


def test_inference_stereo_pad_and_restore():
    model = init_model(small_cfg())
    rng = np.random.RandomState(0)
    # odd size: gets padded to 64x64, output restored to 50x60
    batch = [{"leftImage": rng.rand(50, 60, 3).astype(np.float32) * 255,
              "rightImage": rng.rand(50, 60, 3).astype(np.float32) * 255}]
    results = inference_stereo(model, batch, pad_to_shape=(64, 64))
    disps = results[0]["disps"]
    assert disps[0].shape == (1, 50, 60, 1)
    assert np.isfinite(disps[0]).all()


def test_inference_stereo_scale_factor_rescales_values():
    model = init_model(small_cfg())
    rng = np.random.RandomState(1)
    img = rng.rand(32, 32, 3).astype(np.float32) * 255
    batch = [{"leftImage": img, "rightImage": img}]
    base = inference_stereo(model, batch, pad_to_shape=(64, 64),
                            scale_factor=2.0)
    assert base[0]["disps"][0].shape == (1, 32, 32, 1)
    # disp_div_factor divides output values
    div = inference_stereo(model, batch, pad_to_shape=(64, 64),
                           scale_factor=2.0, disp_div_factor=2.0)
    np.testing.assert_allclose(div[0]["disps"][0],
                               base[0]["disps"][0] / 2.0, atol=1e-5)


def test_schedule_ladder_downgrades_pack():
    """Compile-failure fallback: the forward's candidate ladder starts at
    the shipped pack and falls back to pack=2 then unpacked (GCNet's
    unpacked/pack=4 full-res compiles fail on v5e, DESIGN.md §7)."""
    from densematchingbenchmark_tpu.apis import StereoModel
    from densematchingbenchmark_tpu.configs import get_config

    cfg = get_config("PSMNet/scene_flow")   # ships pack=4
    m = StereoModel(cfg, variables=None)
    labels = [label for label, _ in m._schedule_ladder()]
    assert labels == ["pack=4", "pack=2", "pack=0"]
    packs = [c["model"]["cost_processor"]["cost_aggregator"]["pack"]
             for _, c in m._schedule_ladder()]
    assert packs == [4, 2, 0]
    # the shipped config object is never mutated by the ladder
    assert cfg["model"]["cost_processor"]["cost_aggregator"]["pack"] == 4

    cfg2 = get_config("GCNet/scene_flow")   # ships pack=2
    labels2 = [label for label, _ in StereoModel(cfg2, None)._schedule_ladder()]
    assert labels2 == ["pack=2", "pack=0"]


def test_forward_falls_back_on_compile_failure(monkeypatch):
    """A model whose first schedule raises at run time must transparently
    retry the downgraded schedule and return its output."""
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu import apis
    from densematchingbenchmark_tpu.configs import get_config
    from densematchingbenchmark_tpu.models import build_model

    tiny = {"model.max_disp": 32, "model.dtype": "float32",
            "model.cost_processor.cost_computation.max_disp": 4,
            "model.cost_processor.cost_aggregator.max_disp": 32,
            "model.disp_predictor.max_disp": 4,
            "model.losses.l1_loss.max_disp": 32}
    cfg = get_config("StereoNet/scene_flow_8x_2stage", **tiny)
    real_model = build_model(cfg)
    left = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = real_model.init(jax.random.PRNGKey(0), left, left,
                                train=False)

    calls = []
    real_build = apis.build_model

    def failing_first_build(c):
        calls.append(1)
        if len(calls) == 1:
            class Broken:
                def apply(self, *a, **kw):
                    raise jax.errors.JaxRuntimeError("simulated compile 500")
            return Broken()
        return real_build(c)

    monkeypatch.setattr(apis, "build_model", failing_first_build)
    # pack must be > 0 so the ladder has a second rung
    cfg["model"]["cost_processor"]["cost_aggregator"]["pack"] = 2
    m = apis.StereoModel(cfg, variables)
    out = m.forward(left, left)
    assert len(calls) == 2  # first schedule failed, second served
    assert out["disps"][0].shape == (1, 64, 128, 1)


def test_ladder_memory_skips_known_failures(monkeypatch):
    """ADVICE r4: a pack rung that failed once is never re-attempted (a
    failed TPU compile costs 1-2 min), and a NEW shape starts from the
    last-known-good rung instead of re-trying the failing shipped pack."""
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu import apis
    from densematchingbenchmark_tpu.configs import get_config
    from densematchingbenchmark_tpu.models import build_model

    tiny = {"model.max_disp": 32, "model.dtype": "float32",
            "model.cost_processor.cost_computation.max_disp": 4,
            "model.cost_processor.cost_aggregator.max_disp": 32,
            "model.disp_predictor.max_disp": 4,
            "model.losses.l1_loss.max_disp": 32}
    cfg = get_config("StereoNet/scene_flow_8x_2stage", **tiny)
    real_model = build_model(cfg)
    left = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = real_model.init(jax.random.PRNGKey(0), left, left,
                                train=False)

    attempted = []
    real_build = apis.build_model

    def build_spy(c):
        pack = c["model"]["cost_processor"]["cost_aggregator"]["pack"]
        attempted.append(pack)
        if pack == 2:  # the shipped rung always fails
            class Broken:
                def apply(self, *a, **kw):
                    raise jax.errors.JaxRuntimeError("simulated compile 500")
            return Broken()
        return real_build(c)

    monkeypatch.setattr(apis, "build_model", build_spy)
    cfg["model"]["cost_processor"]["cost_aggregator"]["pack"] = 2
    m = apis.StereoModel(cfg, variables)
    m.forward(left, left)
    assert attempted == [2, 0]          # failed shipped rung, then good one
    # a second, DIFFERENT shape starts directly at the known-good rung
    left2 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    m.forward(left2, left2)
    assert attempted == [2, 0, 0]
    # cached shape: no rebuild at all
    m.forward(left, left)
    assert attempted == [2, 0, 0]
