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
