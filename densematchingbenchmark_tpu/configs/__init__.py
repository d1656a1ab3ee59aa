"""Config zoo: one module per (model, dataset) pair, mirroring configs/.

Each module exposes get_config(**overrides) -> nested dict. Field names
follow the reference's config files (configs/PSMNet/scene_flow.py etc.) so
users can diff them 1:1; paths/hardware fields are replaced by TPU-native
equivalents.
"""

from . import psmnet
from . import gcnet
from . import stereonet
from . import acfnet
from . import anynet
from . import deeppruner
from . import pwcflow

CONFIGS = {
    "PWCFlow/flying_chairs": pwcflow.flying_chairs,
    "RAFT/flying_chairs": pwcflow.raft_flying_chairs,
    "AnyNet/scene_flow": anynet.scene_flow,
    "DeepPruner/scene_flow_4x": deeppruner.scene_flow_4x,
    "DeepPruner/scene_flow_8x": deeppruner.scene_flow_8x,
    "PSMNet/scene_flow": psmnet.scene_flow,
    "PSMNet/kitti_2015": psmnet.kitti_2015,
    "PSMNet/kitti_2012": psmnet.kitti_2012,
    "GCNet/scene_flow": gcnet.scene_flow,
    "GCNet/kitti_2015": gcnet.kitti_2015,
    "GCNet/kitti_2012": gcnet.kitti_2012,
    "StereoNet/scene_flow_8x_2stage": stereonet.scene_flow_8x_2stage,
    "StereoNet/scene_flow_8x_4stage": stereonet.scene_flow_8x_4stage,
    "AcfNet/scene_flow_uniform": acfnet.scene_flow_uniform,
    "AcfNet/scene_flow_adaptive": acfnet.scene_flow_adaptive,
    "AcfNet/kitti_2015_uniform": acfnet.kitti_2015_uniform,
    "AcfNet/kitti_2015_adaptive": acfnet.kitti_2015_adaptive,
    "AcfNet/kitti_2012_uniform": acfnet.kitti_2012_uniform,
    "AcfNet/kitti_2012_adaptive": acfnet.kitti_2012_adaptive,
}


def _dtype_variant(factory, dtype):
    def f(**overrides):
        overrides.setdefault("model.dtype", dtype)
        return factory(**overrides)
    return f


# '<name>_bf16' pins bf16 compute; '<name>_f32' pins f32. bf16 = f32
# params + BN stats, bf16 compute — no loss scaling needed (bf16 shares
# f32's exponent range). Verified: 500-step synthetic convergence tracks
# f32 (tools/bf16_convergence.py, v5e: f32 final 0.865 / bf16 0.814 from
# 147.7; step 319.5 -> 279.6 ms, 1.14x) on top of the bf16 train test +
# activation parity.
CONFIGS.update({f"{name}_bf16": _dtype_variant(fn, "bfloat16")
                for name, fn in list(CONFIGS.items())})
CONFIGS.update({f"{name}_f32": _dtype_variant(fn, "float32")
                for name, fn in list(CONFIGS.items())
                if not name.endswith("_bf16")})


def default_compute_dtype():
    """Backend-conditional default compute precision.

    On TPU the measured-best precision is bf16 (the table in DESIGN.md §3
    and the convergence study are bf16), mirroring the reference shipping
    apex O1 mixed precision in every config (dmb/apis/train.py:104-108);
    CPU (tests, debugging) stays f32. Override per-call with
    `model.dtype`, per-name with the `_f32`/`_bf16` suffix, or globally
    with DMB_DEFAULT_DTYPE.
    """
    import os
    env = os.environ.get("DMB_DEFAULT_DTYPE")
    if env:
        return env
    # Resolve WITHOUT initializing a backend: jax.default_backend() would
    # touch the TPU, and on this rig the tunnel is single-client — a config
    # inspection from a host-side process while a TPU job runs would block
    # on a futex (a hang the try/except can't catch). The platform list is
    # known statically: the axon sitecustomize force-sets
    # jax_platforms='axon,cpu'; tests/CLI set 'cpu'.
    try:
        import jax
        platforms = jax.config.jax_platforms or \
            os.environ.get("JAX_PLATFORMS", "")
    except Exception:
        return "float32"
    first = platforms.split(",")[0].strip().lower() if platforms else ""
    if first in ("", "cpu"):
        # unset = platform autodetection; only then ask the backend (the
        # common paths above never reach this)
        if not first:
            try:
                return ("float32" if jax.default_backend() == "cpu"
                        else "bfloat16")
            except Exception:
                return "float32"
        return "float32"
    return "bfloat16"


def get_config(name, **overrides):
    if not (name.endswith("_bf16") or name.endswith("_f32")):
        overrides.setdefault("model.dtype", default_compute_dtype())
    return CONFIGS[name](**overrides)
