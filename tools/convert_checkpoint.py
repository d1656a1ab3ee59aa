#!/usr/bin/env python
"""Convert a reference (.pth) checkpoint into this framework's format.

Loads the reference's torch model code (CPU, CUDA extensions stubbed),
restores the .pth state_dict into it, converts the weights via
utils/torch_convert, and writes an orbax checkpoint that tools/test.py /
apis.init_model can consume.

Currently supported: GeneralizedStereoModel checkpoints (PSMNet, GCNet,
StereoNet, AcfNet) including their disp_refinement (StereoNet) and
confidence-measure cmn heads (AcfNet) when present in the config.

Example:
  python tools/convert_checkpoint.py --config PSMNet/scene_flow \\
      --pth epoch_10.pth --out-dir work/psmnet_converted
"""

import argparse
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = os.environ.get("DMB_REFERENCE", "/root/reference")


def _stub_cuda_extensions():
    for name, attrs in [
        ("spatial_correlation_sampler", ["SpatialCorrelationSampler"]),
        ("gaterecurrent2dnoind_cuda", []),
        ("detectron2", []),
        ("detectron2.layers", ["DeformConv", "ModulatedDeformConv"]),
    ]:
        if name not in sys.modules:
            m = types.ModuleType(name)
            for a in attrs:
                setattr(m, a, object)
            sys.modules[name] = m


def build_reference_torch_model(cfg):
    """Assemble the reference torch modules for a config (no mmcv needed)."""
    sys.path.insert(0, REFERENCE)
    _stub_cuda_extensions()
    import torch.nn as nn
    from dmb.modeling.stereo.backbones.PSMNet import PSMNetBackbone
    from dmb.modeling.stereo.backbones.GCNet import GCNetBackbone
    from dmb.modeling.stereo.backbones.StereoNet import StereoNetBackbone
    from dmb.modeling.stereo.cost_processors.aggregators.PSMNet import (
        PSMAggregator)
    from dmb.modeling.stereo.cost_processors.aggregators.AcfNet import (
        AcfAggregator)
    from dmb.modeling.stereo.cost_processors.aggregators.GCNet import (
        GCAggregator)
    from dmb.modeling.stereo.cost_processors.aggregators.StereoNet import (
        StereoNetAggregator)
    from dmb.modeling.stereo.disp_refinement.StereoNet import (
        StereoNetRefinement)
    from dmb.modeling.stereo.cmn.cmn import ConfHead

    m = cfg["model"]
    backbones = {"PSMNet": lambda: PSMNetBackbone(3, True),
                 "GCNet": lambda: GCNetBackbone(3, True),
                 "StereoNet": lambda: StereoNetBackbone(
                     3, True, m["backbone"].get("downsample_num", 3),
                     m["backbone"].get("residual_num", 6))}
    aggs = {"PSMNet": lambda: PSMAggregator(m["max_disp"], 64, True),
            "AcfNet": lambda: AcfAggregator(m["max_disp"], 64, True),
            "GCNet": lambda: GCAggregator(m["max_disp"], 64, True),
            "StereoNet": lambda: StereoNetAggregator(
                m["max_disp"], 32, True,
                m["cost_processor"]["cost_aggregator"].get("num", 4))}

    class Wrapper(nn.Module):
        """Mirrors GeneralizedStereoModel's attribute order so state_dict
        keys (backbone.* / cost_processor.*) line up."""

        def __init__(self):
            super().__init__()
            self.backbone = backbones[m["backbone"]["type"]]()
            self.aggregator = aggs[
                m["cost_processor"]["cost_aggregator"]["type"]]()
            if m.get("disp_refinement", {}).get("type") == "StereoNet":
                self.disp_refinement = StereoNetRefinement(
                    in_planes=4, batch_norm=True,
                    num=m["disp_refinement"].get("num", 1))
            if "cmn" in m:
                c = m["cmn"]

                class CmnWrap(nn.Module):
                    def __init__(self):
                        super().__init__()
                        self.conf_heads = nn.ModuleList(
                            [ConfHead(c["in_planes"], True)
                             for _ in range(c["num"])])

                self.cmn = CmnWrap()

    return Wrapper()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--pth", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import torch
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.configs import get_config
    from densematchingbenchmark_tpu.models import build_model
    from densematchingbenchmark_tpu.utils.torch_convert import convert_module
    from densematchingbenchmark_tpu.utils.checkpoint import CheckpointManager
    from densematchingbenchmark_tpu.trainer import (TrainState,
                                                    build_optimizer)

    cfg = get_config(args.config)
    tmodel = build_reference_torch_model(cfg)
    ckpt = torch.load(args.pth, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    # strip DDP 'module.' prefixes; map cost_processor.aggregator ->
    # aggregator (the wrapper's attribute name)
    cleaned = {}
    for k, v in state_dict.items():
        k = k.removeprefix("module.")
        k = k.replace("cost_processor.aggregator.", "aggregator.")
        cleaned[k] = v
    missing, unexpected = tmodel.load_state_dict(cleaned, strict=False)
    if missing:
        print(f"WARNING: {len(missing)} missing keys (e.g. {missing[:3]})")
    if unexpected:
        print(f"WARNING: {len(unexpected)} unexpected keys "
              f"(e.g. {unexpected[:3]})")

    model = build_model(cfg)
    # init at a small spatial size: conv/BN param shapes are
    # resolution-independent, and the full test resolution would run a
    # huge cost-volume forward just to trace shapes (256x512 keeps the
    # PSMNet SPP branch valid: 64-wide pool at 1/4 resolution).
    h, w = cfg["data"]["test"]["input_shape"]
    h, w = min(h, 256), min(w, 512)
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy, train=False)

    # convert per submodule so ordering stays local
    from densematchingbenchmark_tpu.utils.torch_convert import (_flatten,
                                                                _unflatten)
    bb_vars = {"params": variables["params"]["backbone"],
               "batch_stats": variables["batch_stats"]["backbone"]}
    bb_new = convert_module(tmodel.backbone, bb_vars)
    agg_key = [k for k in variables["params"]["cost_processor"]][0]
    agg_vars = {
        "params": variables["params"]["cost_processor"][agg_key],
        "batch_stats": variables["batch_stats"]["cost_processor"][agg_key]}
    agg_new = convert_module(tmodel.aggregator, agg_vars)

    params = dict(variables["params"])
    params["backbone"] = bb_new["params"]
    params["cost_processor"] = {agg_key: agg_new["params"]}
    stats = dict(variables["batch_stats"])
    stats["backbone"] = bb_new["batch_stats"]
    stats["cost_processor"] = {agg_key: agg_new["batch_stats"]}
    # optional heads present in both trees: refinement, confidence (cmn)
    for tattr, fkey in (("disp_refinement", "disp_refinement"),
                        ("cmn", "cmn")):
        if fkey in params and hasattr(tmodel, tattr):
            sub_vars = {"params": variables["params"][fkey]}
            if fkey in variables.get("batch_stats", {}):
                sub_vars["batch_stats"] = variables["batch_stats"][fkey]
            sub_new = convert_module(getattr(tmodel, tattr), sub_vars)
            params[fkey] = sub_new["params"]
            if "batch_stats" in sub_new:
                stats[fkey] = sub_new["batch_stats"]
    variables = {"params": params, "batch_stats": stats}

    tx, _ = build_optimizer(cfg, steps_per_epoch=1)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(0))
    saved = CheckpointManager(args.out_dir).save(
        0, jax.device_get(state),
        metadata={"converted_from": os.path.abspath(args.pth)},
        overwrite=True)
    if not saved:
        raise RuntimeError(f"orbax refused to save to {args.out_dir}")
    print(f"converted checkpoint written to {args.out_dir}/checkpoints/0")


if __name__ == "__main__":
    main()
