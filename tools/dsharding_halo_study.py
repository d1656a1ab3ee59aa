#!/usr/bin/env python
"""D-sharded cost-volume cost model: collective bytes vs compute (VERDICT
r2 next #9).

Only one real chip is reachable here, so the halo/gather cost of the
D-sharded packed aggregator cannot be wall-clock-timed on a real (2,4)
mesh. What CAN be grounded in measurement:

  1. compile the packed PSM aggregator under a (1, n_model) mesh on
     virtual CPU devices and read the ACTUAL collective ops + bytes XLA
     SPMD inserts (the strided stages gather D per the miscompile guard,
     parallel/mesh.py:49-61; stride-1 stages keep the D sharding);
  2. take the single-chip compute time of the same aggregator from the
     real-TPU bench (pass --compute-ms, e.g. ~19 ms of the 37.98 ms
     PSMNet forward, DESIGN.md §3);
  3. model transfer time at ICI bandwidth (v5e: 4 links/chip x ~186 GB/s
     bidir each, --ici-gbps to override).

Prints the collective inventory and the break-even: D-sharding pays when
per-chip compute saved (compute_ms * (1 - 1/n)) exceeds gather bytes /
ICI bandwidth.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/dsharding_halo_study.py --n-model 4 --compute-ms 19
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-model", type=int, default=4)
    ap.add_argument("--max-disp", type=int, default=192)
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--width", type=int, default=312,
                    help="feature-scale H, W (384x1248 image -> 96x312)")
    ap.add_argument("--pack", type=int, default=4)
    ap.add_argument("--compute-ms", type=float, default=19.0,
                    help="measured single-chip aggregator compute at this "
                         "shape (DESIGN.md §3 trunk share of the forward)")
    ap.add_argument("--ici-gbps", type=float, default=180.0,
                    help="per-direction usable ICI GB/s between neighbors")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.parallel.mesh import (
        make_mesh, cost_volume_sharding, batch_only_volume_sharding,
        replicated)
    from densematchingbenchmark_tpu.models.aggregators.psmnet import (
        PSMAggregator)

    n = args.n_model
    assert len(jax.devices()) >= n, "set xla_force_host_platform_device_count"
    mesh = make_mesh((1, n))

    d4 = args.max_disp // 4
    c = 64
    x = jnp.zeros((1, d4, args.height, args.width, c), jnp.float32)
    agg = PSMAggregator(max_disp=args.max_disp, batch_norm=True,
                        pack=args.pack, return_low_res=True,
                        strided_sharding=batch_only_volume_sharding(mesh),
                        volume_sharding=cost_volume_sharding(mesh))
    variables = agg.init(jax.random.PRNGKey(0), x, train=False)
    sh = cost_volume_sharding(mesh)

    @jax.jit
    def fwd(v, vol):
        vol = jax.lax.with_sharding_constraint(vol, sh)
        return agg.apply(v, vol, train=False)

    lowered = fwd.lower(jax.device_put(variables, replicated(mesh)), x)
    compiled = lowered.compile()
    hlo = compiled.as_text()

    # inventory the collectives XLA SPMD inserted
    coll = {}
    bytes_total = 0
    for m in re.finditer(
            r"(\S+) = (\S+) (all-gather|all-reduce|collective-permute|"
            r"all-to-all)\(", hlo):
        shape = m.group(2)
        kind = m.group(3)
        bracket = re.search(r"\[([\d,]*)\]", shape)
        dims = [int(d) for d in bracket.group(1).split(",") if d] \
            if bracket and bracket.group(1) else []
        elems = 1
        for d in dims:
            elems *= d
        nbytes = elems * (2 if shape.startswith("bf16") else 4)
        coll.setdefault(kind, []).append((shape, nbytes))
        if kind in ("all-gather", "all-to-all", "collective-permute"):
            bytes_total += nbytes
    for kind, items in coll.items():
        print(f"{kind}: {len(items)} ops, "
              f"{sum(b for _, b in items)/2**20:.1f} MiB total")
        for shape, b in sorted(items, key=lambda t: -t[1])[:5]:
            print(f"   {b/2**20:8.2f} MiB  {shape[:90]}")

    xfer_ms = bytes_total / (args.ici_gbps * 1e9) * 1e3
    saved_ms = args.compute_ms * (1 - 1 / n)
    print(json.dumps({
        "n_model": n,
        "gather_bytes_mib": round(bytes_total / 2**20, 1),
        "modeled_transfer_ms": round(xfer_ms, 3),
        "single_chip_compute_ms": args.compute_ms,
        "compute_saved_ms": round(saved_ms, 3),
        "d_sharding_wins": bool(saved_ms > xfer_ms),
        "break_even_ici_gbps": round(
            bytes_total / (saved_ms * 1e-3) / 1e9, 1) if saved_ms > 0
        else None,
    }))


if __name__ == "__main__":
    main()
