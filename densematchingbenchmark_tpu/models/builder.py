"""Config-driven model zoo builder.

Parity target: the reference's string-keyed builders
(dmb/modeling/__init__.py:10-12, dmb/modeling/stereo/*/builder.py). Configs
are plain nested dicts (see densematchingbenchmark_tpu/configs/) with the
same field names as the reference's Python config files, so a reference user
can port a config by mostly renaming nothing.
"""

import jax.numpy as jnp

from .generalized import GeneralizedStereoModel
from .cost_processors import CostProcessor
from .predictors import build_disp_predictor
from .cmn import Cmn
from .backbones.psmnet import PSMNetBackbone
from .backbones.gcnet import GCNetBackbone
from .backbones.stereonet import StereoNetBackbone
from .backbones.anynet import AnyNetBackbone
from .backbones.deeppruner import (DeepPrunerBestBackbone,
                                   DeepPrunerFastBackbone)
from .anynet import AnyNet
from .deeppruner import DeepPruner
from .refinement.anynet import AnyNetRefinement
from .aggregators.psmnet import PSMAggregator
from .aggregators.acfnet import AcfAggregator
from .aggregators.gcnet import GCAggregator
from .aggregators.stereonet import StereoNetAggregator
from .refinement.stereonet import StereoNetRefinement

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}

BACKBONES = {
    "PSMNet": PSMNetBackbone,
    "GCNet": GCNetBackbone,
    "StereoNet": StereoNetBackbone,
    "AnyNet": AnyNetBackbone,
    "BestDeepPruner": DeepPrunerBestBackbone,
    "FastDeepPruner": DeepPrunerFastBackbone,
}

AGGREGATORS = {
    "PSMNet": PSMAggregator,
    "AcfNet": AcfAggregator,
    "GCNet": GCAggregator,
    "StereoNet": StereoNetAggregator,
}

REFINEMENTS = {
    "StereoNet": StereoNetRefinement,
    "AnyNet": AnyNetRefinement,
}

VOLUME_TYPES = {
    "Concatenation": "concatenation",
    "Difference": "difference",
    "Correlation": "correlation",
}


def build_backbone(model_cfg, dtype):
    cfg = model_cfg["backbone"]
    cls = BACKBONES[cfg["type"]]
    kwargs = {k: v for k, v in cfg.items() if k != "type"}
    return cls(batch_norm=model_cfg.get("batch_norm", True), dtype=dtype,
               **kwargs)


def build_aggregator(agg_cfg, batch_norm, dtype, mesh=None):
    cls = AGGREGATORS[agg_cfg["type"]]
    kwargs = {k: v for k, v in agg_cfg.items()
              if k not in ("type", "in_planes")}
    if mesh is not None and hasattr(cls, "strided_sharding"):
        # D-sharded cost volumes must gather D around strided stages
        # (parallel/mesh.batch_only_volume_sharding docstring)
        from ..parallel.mesh import (batch_only_volume_sharding,
                                     cost_volume_sharding)
        kwargs.setdefault("strided_sharding",
                          batch_only_volume_sharding(mesh))
        kwargs.setdefault("volume_sharding", cost_volume_sharding(mesh))
    return cls(batch_norm=batch_norm, dtype=dtype, **kwargs)


def build_cost_processor(model_cfg, dtype, mesh=None):
    cfg = model_cfg["cost_processor"]
    comp = cfg.get("cost_computation", {})
    aggregator = build_aggregator(cfg["cost_aggregator"],
                                  model_cfg.get("batch_norm", True), dtype,
                                  mesh=mesh)
    volume_sharding = None
    if mesh is not None:
        from ..parallel.mesh import cost_volume_sharding
        volume_sharding = cost_volume_sharding(mesh)
    return CostProcessor(
        aggregator=aggregator,
        volume_type=VOLUME_TYPES[cfg["type"]],
        max_disp=comp.get("max_disp", model_cfg["max_disp"]),
        start_disp=comp.get("start_disp", 0),
        dilation=comp.get("dilation", 1),
        normalize=comp.get("normalize", False),
        p=comp.get("p", 1.0),
        dtype=dtype,
        volume_sharding=volume_sharding)


def build_model(cfg, mesh=None):
    """cfg (nested dict, see configs/) -> Flax module.

    Dispatches on cfg['model']['meta_architecture'] like the reference's
    _META_ARCHITECTURES registry (models/__init__.py:6-10). Passing a mesh
    enables cost-volume sharding (batch on 'data', disparity on 'model').
    """
    model_cfg = cfg["model"]
    dtype = _DTYPES[model_cfg.get("dtype", "float32")]
    arch = model_cfg.get("meta_architecture", "GeneralizedStereoModel")
    if cfg.get("task") == "flow":
        from ..flow.models import build_flow_model
        return build_flow_model(cfg)
    if arch == "GeneralizedStereoModel":
        # Pallas-fused upsample+soft-argmin: only valid when the model
        # doesn't need the full-res cost volume elsewhere (no cmn) and the
        # aggregator supports low-res output (PSMNet trunk).
        fused = (model_cfg.get("eval", {}).get("fused_upsample_argmin",
                                               False)
                 and "cmn" not in model_cfg
                 and model_cfg["cost_processor"]["cost_aggregator"]["type"]
                 == "PSMNet"
                 and model_cfg["disp_predictor"]["type"] in ("FASTER",
                                                             "DEFAULT"))
        if fused:
            model_cfg = dict(model_cfg)
            cp = dict(model_cfg["cost_processor"])
            agg = dict(cp["cost_aggregator"])
            agg["return_low_res"] = True
            cp["cost_aggregator"] = agg
            model_cfg["cost_processor"] = cp
        # GCNet phase-argmin head: the full-res cost volume's only consumer
        # is the soft-argmin over D, so the layer-37 head stays in phase
        # layout and the volume is never materialized (ops/conv3d.
        # conv3d_transpose_s2_c1_phase_form + soft_argmin.phase_soft_argmin).
        # Valid only when nothing else reads the volume (no cmn, no local
        # predictor) and the disparity range is the plain 0..D-1 ladder.
        pred = model_cfg["disp_predictor"]
        phase = (model_cfg["cost_processor"]["cost_aggregator"].get(
                     "phase_argmin", False)
                 and model_cfg["cost_processor"]["cost_aggregator"]["type"]
                 == "GCNet"
                 and "cmn" not in model_cfg
                 and pred["type"] in ("FASTER", "DEFAULT")
                 and pred.get("start_disp", 0) == 0
                 and pred.get("dilation", 1) == 1)
        if not phase:
            cp = dict(model_cfg["cost_processor"])
            agg = {k: v for k, v in cp["cost_aggregator"].items()
                   if k != "phase_argmin"}
            cp["cost_aggregator"] = agg
            model_cfg = dict(model_cfg)
            model_cfg["cost_processor"] = cp
        cmn = None
        if "cmn" in model_cfg:
            c = model_cfg["cmn"]
            cmn = Cmn(in_planes=c["in_planes"], num=c["num"],
                      alpha=c["alpha"], beta=c["beta"],
                      batch_norm=model_cfg.get("batch_norm", True),
                      dtype=dtype)
        refinement = None
        if "disp_refinement" in model_cfg:
            r = model_cfg["disp_refinement"]
            cls = REFINEMENTS[r["type"]]
            kwargs = {k: v for k, v in r.items()
                      if k not in ("type", "in_planes")}
            refinement = cls(batch_norm=model_cfg.get("batch_norm", True),
                             dtype=dtype, **kwargs)
        return GeneralizedStereoModel(
            backbone=build_backbone(model_cfg, dtype),
            cost_processor=build_cost_processor(model_cfg, dtype, mesh),
            disp_predictor=build_disp_predictor(model_cfg["disp_predictor"]),
            cmn=cmn,
            disp_refinement=refinement,
            fused_upsample_argmin=fused,
            phase_argmin=phase,
            max_disp=model_cfg["max_disp"])
    if arch == "AnyNet":
        comp = model_cfg["cost_processor"]["cost_computation"]
        agg = model_cfg["cost_processor"]["cost_aggregator"]
        refinement = None
        if "disp_refinement" in model_cfg:
            r = model_cfg["disp_refinement"]
            refinement = AnyNetRefinement(
                spn_planes=r.get("spn_planes", 8),
                batch_norm=model_cfg.get("batch_norm", True), dtype=dtype,
                pack=r.get("pack", 0))
        return AnyNet(
            backbone=build_backbone(model_cfg, dtype),
            disp_refinement=refinement,
            max_disp=model_cfg["max_disp"],
            stage_max_disp=dict(comp["max_disp"]),
            stage_start_disp=dict(comp["start_disp"]),
            stage_dilation=dict(comp["dilation"]),
            stage_agg_planes=dict(agg["agg_planes"]),
            agg_num=agg.get("num", 4),
            batch_norm=model_cfg.get("batch_norm", True),
            dtype=dtype)
    if arch == "DeepPruner":
        sampler = model_cfg["disp_sampler"]
        proc = model_cfg["cost_processor"]
        return DeepPruner(
            backbone=build_backbone(model_cfg, dtype),
            max_disp=model_cfg["max_disp"],
            scale=model_cfg.get("scale", 4),
            patch_match_sample_number=sampler.get(
                "patch_match_disparity_sample_number", 14),
            uniform_sample_number=sampler.get(
                "uniform_disparity_sample_number", 9),
            propagation_filter_size=sampler.get("propagation_filter_size", 3),
            iterations=sampler.get("iterations", 3),
            temperature=sampler.get("temperature", 7),
            hourglass_in_planes=proc.get("confidence_range_predictor", {})
            .get("hourglass_in_planes", 16),
            refinement_num=model_cfg.get("disp_refinement", {}).get("num", 1),
            refinement_pack=model_cfg.get("disp_refinement", {}).get(
                "pack", 0),
            pm_scoring=sampler.get("scoring", "warp"),
            batch_norm=model_cfg.get("batch_norm", True),
            dtype=dtype)
    raise ValueError(f"unknown meta architecture {arch}")
