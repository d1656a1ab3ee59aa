"""Per-family train-step throughput table on the real chip.

VERDICT r3 #4: the reference publishes training wall-clocks per family
(configs/*/ResultOf*.md; e.g. PSMNet SceneFlow 10 ep = 22h44m on 4 GPUs x
batch 3 = ~1.08 samples/s/GPU over the 35,454-sample train split); this
repo had an on-chip train-step number only for PSMNet. This tool measures
the FULL jitted train step (forward + losses + grads + RMSprop update +
BN-stat update) for every stereo family at the reference crop 256x512 and
per-device batch 3 (configs/*/scene_flow.py imgs_per_gpu=3), in f32 and
bf16, and reports samples/s/chip.

Also verifies the packed schedules are ACTIVE in the train step by timing
each family with packing disabled (--with-unpacked) — PackedBatchNorm's
train mode must carry the same speedup as eval.

Usage (real TPU, single client!):
  python tools/train_throughput.py [--iters 8] [--with-unpacked]
Prints a table + one JSON line per family (train_throughput_*.json style).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Reference training rates, derived from the published wall-clocks:
# samples/s/GPU = 35454 train samples * epochs / (seconds * 4 GPUs).
# (ResultOf*.md; SceneFlow train split = 35,454 pairs, 4x GTX1080Ti.)
REFERENCE_RATES = {
    "PSMNet/scene_flow": 35454 * 10 / (81840.0 * 4),          # 22h44m/10ep
    "AcfNet/scene_flow_adaptive": 35454 * 20 / (484260.0 * 4),  # 134h31m/20ep
    "StereoNet/scene_flow_8x_2stage": 35454 * 11 / (147360.0 * 4),  # 40h56m/11ep
    "AnyNet/scene_flow": 35454 * 20 / (51120.0 * 4),          # 14h12m/20ep
}

FAMILIES = [
    # (config, overrides disabling every packed schedule, for --with-unpacked)
    ("PSMNet/scene_flow",
     {"model.cost_processor.cost_aggregator.pack": 0, "model.backbone.pack": 0}),
    ("AcfNet/scene_flow_adaptive",
     {"model.cost_processor.cost_aggregator.pack": 0, "model.backbone.pack": 0}),
    ("AcfNet/scene_flow_uniform",
     {"model.cost_processor.cost_aggregator.pack": 0, "model.backbone.pack": 0}),
    ("GCNet/scene_flow",
     {"model.cost_processor.cost_aggregator.pack": 0}),
    ("StereoNet/scene_flow_8x_2stage", {"model.disp_refinement.pack": 0}),
    ("StereoNet/scene_flow_8x_4stage", {"model.disp_refinement.pack": 0}),
    ("AnyNet/scene_flow", {}),
    ("DeepPruner/scene_flow_4x", {"model.disp_sampler.scoring": "warp"}),
    ("DeepPruner/scene_flow_8x", {"model.disp_sampler.scoring": "warp"}),
]


def measure_train_step(cfg_name, dtype, batch, h, w, iters, overrides=None):
    # batch None -> the config's own per-device batch (reference
    # imgs_per_gpu parity; e.g. GCNet trains at 1, not 3)
    import numpy as np
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.configs import get_config
    from densematchingbenchmark_tpu.models import build_model
    from densematchingbenchmark_tpu.losses import make_loss_evaluator
    from densematchingbenchmark_tpu.trainer import (TrainState,
                                                    build_optimizer,
                                                    make_train_step)

    cfg = get_config(cfg_name, **{"model.dtype": dtype}, **(overrides or {}))
    if batch is None:
        batch = int(cfg["data"].get("batch_size_per_device", 3))
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    small = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), small, small, train=False)
    tx, _ = build_optimizer(cfg, steps_per_epoch=1000)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    evaluator = make_loss_evaluator(
        cfg["model"]["losses"], sparse=cfg["data"]["sparse"],
        cmn_losses_cfg=cfg["model"].get("cmn", {}).get("losses"))
    step = make_train_step(model, tx, evaluator, donate=False)

    # Distinct device-staged batches (DESIGN.md §3 honest-harness rules).
    batches = []
    measure_train_step.last_batch = batch
    for i in range(iters):
        batches.append(jax.device_put({
            "leftImage": rng.rand(batch, h, w, 3).astype(np.float32),
            "rightImage": rng.rand(batch, h, w, 3).astype(np.float32),
            "leftDisp": (rng.rand(batch, h, w, 1) * 160 + 1
                         ).astype(np.float32),
        }))
    jax.block_until_ready(batches)

    state, metrics = step(state, batches[0])  # compile + warm
    assert np.isfinite(float(metrics["loss"]))
    state, _ = step(state, batches[1 % iters])
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batches[i])
    # chained-state steps serialize; force materialization via scalar read
    final_loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(final_loss)
    return dt * 1e3, batch / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--batch", type=int, default=None,
                    help="per-device batch; default = each config's own "
                         "batch_size_per_device (reference imgs_per_gpu)")
    ap.add_argument("--shape", default="256x512")    # reference train crop
    ap.add_argument("--with-unpacked", action="store_true",
                    help="also time each family with packing disabled")
    ap.add_argument("--only", default=None, help="substring filter")
    ap.add_argument("--set", action="append", default=[], dest="sets",
                    help="config override key=value (value eval'd as a "
                         "Python literal), e.g. --set model.cost_processor."
                         "cost_aggregator.remat=True for the AcfNet-f32 "
                         "remat fit (VERDICT r4 #4)")
    ap.add_argument("--no-subprocess", action="store_true",
                    help="run in-process (single family only: compiled "
                         "executables accumulate HBM across families and "
                         "OOM the chip — measured round 4)")
    args = ap.parse_args()
    h, w = (int(x) for x in args.shape.split("x"))
    import ast
    cli_overrides = {}
    for kv in args.sets:
        k, v = kv.split("=", 1)
        try:
            cli_overrides[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            cli_overrides[k] = v

    if not args.no_subprocess and args.only is None:
        # One subprocess per family: the TPU tunnel is single-client and
        # per-family executables/buffers otherwise accumulate until
        # RESOURCE_EXHAUSTED (observed after the first family).
        import subprocess
        for cfg_name, _ in FAMILIES:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--only", cfg_name, "--iters", str(args.iters),
                   "--shape", args.shape, "--no-subprocess"]
            if args.batch is not None:
                cmd += ["--batch", str(args.batch)]
            if args.with_unpacked:
                cmd.append("--with-unpacked")
            for kv in args.sets:
                cmd += ["--set", kv]
            r = subprocess.run(cmd, capture_output=True, text=True)
            for line in r.stdout.splitlines():
                if line.startswith(("{", cfg_name)):
                    print(line, flush=True)
            if r.returncode != 0:
                print(f"{cfg_name}: subprocess rc={r.returncode} "
                      f"{r.stderr.strip().splitlines()[-1] if r.stderr else ''}")
        return

    print(f"train step @{h}x{w} b{args.batch} (full fwd+loss+grad+update)")
    header = f"{'family':34s} {'f32 ms':>8s} {'bf16 ms':>8s} {'sps(bf16)':>9s}"
    if args.with_unpacked:
        header += f" {'unpk bf16':>9s} {'pack x':>7s}"
    header += f" {'ref sps':>8s} {'vs ref':>7s}"
    print(header)

    for cfg_name, unpack_ov in FAMILIES:
        if args.only and args.only not in cfg_name:
            continue
        # bf16 first: it is the shipped TPU default (configs/__init__.py);
        # f32 may legitimately OOM at the reference batch (AcfNet's
        # full-res f32 focal-loss volumes exceed v5e HBM) — record OOM for
        # that column and keep the family.
        def try_dtype(dtype):
            try:
                return measure_train_step(cfg_name, dtype, args.batch,
                                          h, w, args.iters,
                                          overrides=cli_overrides)
            except Exception as e:
                msg = type(e).__name__
                if "RESOURCE_EXHAUSTED" in str(e):
                    msg = "OOM"
                print(f"{cfg_name:34s} {dtype}: {msg}")
                return None, None

        ms16, sps = try_dtype("bfloat16")
        if ms16 is None:
            continue
        batch_used = getattr(measure_train_step, "last_batch", args.batch)
        ms32, _ = try_dtype("float32")
        row = (f"{cfg_name:34s} "
               f"{(f'{ms32:8.1f}' if ms32 else '     OOM')} "
               f"{ms16:8.1f} {sps:9.2f}")
        rec = {"metric": "train_samples_per_sec_per_chip",
               "family": cfg_name, "shape": f"{h}x{w}", "batch": batch_used,
               "f32_ms": round(ms32, 1) if ms32 else "OOM",
               "bf16_ms": round(ms16, 1),
               "value": round(sps, 2), "unit": "samples/s/chip"}
        if args.with_unpacked and unpack_ov:
            try:
                msu, _ = measure_train_step(cfg_name, "bfloat16", args.batch,
                                            h, w, args.iters,
                                            {**unpack_ov, **cli_overrides})
                row += f" {msu:9.1f} {msu / ms16:7.2f}"
                rec["unpacked_bf16_ms"] = round(msu, 1)
            except Exception as e:
                row += f"  unpack-ERR({type(e).__name__})"
        ref = REFERENCE_RATES.get(cfg_name)
        if ref:
            row += f" {ref:8.2f} {sps / ref:6.1f}x"
            rec["ref_samples_per_sec_per_gpu"] = round(ref, 3)
            rec["vs_baseline"] = round(sps / ref, 2)
        print(row)
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
