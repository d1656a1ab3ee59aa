"""Data-loader throughput proof (host side, no TPU needed).

VERDICT r3 #8: the reference's torch DataLoader was never the training
bottleneck on GPU; prove the same holds for this loader. Generates a
SceneFlow-shaped on-disk dataset (540x960 PNG pairs + PFM disparities,
written once to --workdir), then measures `data.DataLoader` end-to-end —
JSON annotations -> native PNG/PFM decode -> random-crop 256x512 +
normalize -> collate -> prefetch queue — in samples/s at the reference
worker count, and compares against the measured train-step demand.

Parity target: dmb/data/loaders/builder.py:17-52 (workers_per_gpu=8 in
the shipped configs; this rig has 2 cores, so --workers 2 is the honest
local number).

Usage: python tools/loader_throughput.py [--n 48] [--workers 2]
         [--batch 3] [--epochs 2] [--train-step-ms 280]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_fake_sceneflow(root, n, h=540, w=960, seed=0):
    """Write n PNG stereo pairs + PFM disparities + a reference-format
    annotation JSON; returns the annotation path."""
    import numpy as np
    import imageio.v2 as imageio
    from densematchingbenchmark_tpu.data.io import save_pfm

    os.makedirs(os.path.join(root, "frames"), exist_ok=True)
    os.makedirs(os.path.join(root, "disparity"), exist_ok=True)
    rng = np.random.RandomState(seed)
    anns = []
    for i in range(n):
        left = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        right = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        disp = (rng.rand(h, w) * 192).astype(np.float32)
        lp = f"frames/{i:04d}_L.png"
        rp = f"frames/{i:04d}_R.png"
        dp = f"disparity/{i:04d}.pfm"
        imageio.imwrite(os.path.join(root, lp), left)
        imageio.imwrite(os.path.join(root, rp), right)
        save_pfm(os.path.join(root, dp), disp)
        anns.append({"left_image_path": lp, "right_image_path": rp,
                     "left_disp_map_path": dp})
    ann_path = os.path.join(root, "annotations.json")
    with open(ann_path, "w") as fp:
        json.dump(anns, fp)
    return ann_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/dmb_loader_bench")
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--batch", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--train-step-ms", type=float, default=279.6,
                    help="measured train-step ms at the target batch "
                         "(PSMNet bf16 256x512 b2 = 279.6, DESIGN.md §7)")
    ap.add_argument("--train-step-batch", type=int, default=2)
    args = ap.parse_args()

    from densematchingbenchmark_tpu.data import DataLoader, transforms
    from densematchingbenchmark_tpu.data.datasets import SceneFlowDataset

    ann = os.path.join(args.workdir, "annotations.json")
    if not os.path.exists(ann):
        print(f"writing {args.n} fake SceneFlow samples to {args.workdir}…")
        ann = build_fake_sceneflow(args.workdir, args.n)

    mean = (123.675, 116.28, 103.53)
    std = (58.395, 57.12, 57.375)
    ds = SceneFlowDataset(ann, args.workdir)
    ds.transform = transforms.make_train_transform((256, 512), mean, std)

    loader = DataLoader(ds, args.batch, shuffle=True,
                        num_workers=args.workers, prefetch=4)

    # warm epoch (page cache, thread-pool spin-up)
    for _ in loader.epoch(0):
        pass

    t0 = time.perf_counter()
    n_samples = 0
    for ep in range(1, 1 + args.epochs):
        for batch in loader.epoch(ep):
            n_samples += batch["leftImage"].shape[0]
    dt = time.perf_counter() - t0
    sps = n_samples / dt
    per_sample_ms = 1e3 / sps

    demand = args.train_step_batch / (args.train_step_ms / 1e3)
    print(f"loader: {sps:.1f} samples/s ({per_sample_ms:.1f} ms/sample) "
          f"with {args.workers} workers @540x960 -> crop 256x512")
    print(f"train-step demand: {demand:.1f} samples/s "
          f"(step {args.train_step_ms} ms @ batch {args.train_step_batch})")
    print(f"margin: {sps / demand:.2f}x "
          f"({'loader keeps the chip fed' if sps > demand else 'LOADER-BOUND'})")
    print(json.dumps({
        "metric": "loader_samples_per_sec", "value": round(sps, 1),
        "unit": "samples/s", "workers": args.workers,
        "vs_train_step_demand": round(sps / demand, 2)}))


if __name__ == "__main__":
    main()
