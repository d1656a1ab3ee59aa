"""Benchmark: PSMNet inference throughput on one chip at 384x1248, batch 1.

Baseline: the reference's README table — PSMNet 1.67 FPS (599.2 ms) on a
GTX1080Ti at 384x1248 batch 1 (BASELINE.md). North star: >= 5x (8.4 FPS).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on whatever jax.default_backend() is (the real TPU under axon).
"""

import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 1.67  # README.md:55, GTX1080Ti


def main():
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.configs import get_config
    from densematchingbenchmark_tpu.models import build_model

    h, w = 384, 1248
    dtype = "bfloat16" if jax.default_backend() != "cpu" else "float32"
    cfg = get_config("PSMNet/scene_flow", **{"model.dtype": dtype})
    model = build_model(cfg)

    left = jnp.zeros((1, h, w, 3), jnp.float32)
    right = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)

    @jax.jit
    def forward(left, right):
        return model.apply(variables, left, right, train=False)["disps"][0]

    # Distinct random frames per iteration (DESIGN.md §3: only
    # distinct-input timings are trustworthy over the axon tunnel), staged
    # on device up front so H2D transfer is not timed.
    iters = 10
    keys = jax.random.split(jax.random.PRNGKey(1), 2 * iters)
    frames = [
        (jax.device_put(jax.random.normal(keys[2 * i], left.shape)),
         jax.device_put(jax.random.normal(keys[2 * i + 1], right.shape)))
        for i in range(iters)
    ]
    jax.block_until_ready(frames)

    # warmup / compile
    forward(*frames[0]).block_until_ready()
    forward(*frames[1]).block_until_ready()

    t0 = time.perf_counter()
    outs = [forward(l, r) for l, r in frames]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "psmnet_inference_fps_384x1248_b1",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "ms": round(dt * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
