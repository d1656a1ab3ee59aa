"""Multi-host (multi-process) launch wiring.

Parity target: dmb/utils/env.py:16-53 (init_dist with 'pytorch'/'slurm'
launchers around torch.distributed.init_process_group) and
tools/dist_train.sh. TPU-native: the single collective runtime is JAX's
distributed system — `jax.distributed.initialize` connects every host to a
coordinator, after which `jax.devices()` is the global device list, meshes
span all hosts, and GSPMD collectives ride ICI. No backend choice exists
(no NCCL/gloo split); the launcher only decides where the coordinator
address / process count / process id come from:

  'tpu'   — Cloud TPU metadata: jax.distributed.initialize() no-arg
            auto-detection (the normal path on real pods).
  'env'   — torch.distributed-style env vars MASTER_ADDR / MASTER_PORT /
            WORLD_SIZE / RANK (so existing pytorch launch scripts and
            `torchrun`-style wrappers keep working).
  'slurm' — SLURM_PROCID / SLURM_NTASKS / SLURM_STEP_NODELIST, coordinator
            on the first node of the allocation (reference
            _init_dist_slurm, env.py:27-40).
  'none'  — single process (default); no initialization.

Explicit --coordinator/--num-processes/--process-id flags override any
launcher-derived values.
"""

import logging
import os
import re

log = logging.getLogger("dmb")


def _first_slurm_node(node_list):
    """First hostname of a SLURM nodelist without scontrol.

    Handles 'host1,host2', 'prefix[003-007,010]', and plain 'host'.
    (The reference shells out to `scontrol show hostname`; that binary is
    absent off-cluster, and the common encodings are trivial to parse.)
    """
    m = re.match(r"([^,\[]+)(\[([^\]]+)\])?", node_list)
    prefix, bracket = m.group(1), m.group(3)
    if not bracket:
        return prefix
    first = re.split(r"[,-]", bracket)[0]
    return prefix + first


def resolve_launcher(launcher, coordinator=None, num_processes=None,
                     process_id=None, port=29500):
    """Return jax.distributed.initialize kwargs for the launcher, or None
    when no distributed init should run (launcher='none', world size 1)."""
    kw = {}
    if launcher == "none" or launcher is None:
        if coordinator is None and num_processes is None:
            return None
    elif launcher == "tpu":
        kw = {}  # no-arg: Cloud TPU / GKE metadata auto-detection
    elif launcher == "env":
        addr = os.environ["MASTER_ADDR"]
        env_port = os.environ.get("MASTER_PORT", str(port))
        kw = dict(coordinator_address=f"{addr}:{env_port}",
                  num_processes=int(os.environ["WORLD_SIZE"]),
                  process_id=int(os.environ["RANK"]))
    elif launcher == "slurm":
        node_list = os.environ.get("SLURM_STEP_NODELIST",
                                   os.environ.get("SLURM_NODELIST"))
        addr = _first_slurm_node(node_list)
        kw = dict(coordinator_address=f"{addr}:{port}",
                  num_processes=int(os.environ["SLURM_NTASKS"]),
                  process_id=int(os.environ["SLURM_PROCID"]))
    else:
        raise ValueError(f"invalid launcher {launcher!r} "
                         "(expected none|tpu|env|slurm)")
    if coordinator is not None:
        kw["coordinator_address"] = coordinator
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    if launcher in ("none", None) and kw.get("num_processes", 1) == 1:
        return None
    return kw


def init_distributed(launcher="none", coordinator=None, num_processes=None,
                     process_id=None, port=29500):
    """Connect this process to the JAX distributed runtime (idempotent
    no-op for single-process runs). Call before any other jax API touches
    the backend. Returns (process_index, process_count)."""
    import jax

    kw = resolve_launcher(launcher, coordinator, num_processes,
                          process_id, port)
    if kw is not None:
        jax.distributed.initialize(**kw)
        log.info("jax.distributed initialized: process %d/%d, %d local / "
                 "%d global devices", jax.process_index(),
                 jax.process_count(), jax.local_device_count(),
                 jax.device_count())
    return jax.process_index(), jax.process_count()


def add_distributed_args(parser):
    """Attach the standard multi-host flags to a tools/ CLI parser."""
    g = parser.add_argument_group("distributed")
    g.add_argument("--launcher", default="none",
                   choices=["none", "tpu", "env", "slurm"],
                   help="multi-host init source (reference init_dist "
                        "launchers; 'tpu' = Cloud TPU auto-detect)")
    g.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="jax.distributed coordinator address (overrides "
                        "the launcher-derived value)")
    g.add_argument("--num-processes", type=int, default=None)
    g.add_argument("--process-id", type=int, default=None)
    return parser
