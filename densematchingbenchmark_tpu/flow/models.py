"""Flow model registry — intentionally empty, matching the reference.

The reference ships flow data/eval/vis plumbing but registers zero flow
models (dmb/modeling/flow/models/__init__.py:2-4). This registry is the
extension point for flow meta-architectures (e.g. a correlation-volume
PWC-style model can reuse ops/cost_volume.correlation1d_volume generalized
to 2-D search).
"""

FLOW_META_ARCHITECTURES = {}


def build_flow_model(cfg):
    arch = cfg["model"]["meta_architecture"]
    if arch not in FLOW_META_ARCHITECTURES:
        raise ValueError(
            f"no flow meta-architecture registered for '{arch}' "
            f"(registry is empty, matching the reference's flow support)")
    return FLOW_META_ARCHITECTURES[arch](cfg)
