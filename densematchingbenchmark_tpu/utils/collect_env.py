"""Environment dump for reproducibility logs.

Parity target: dmb/utils/collect_env.py (torch env dump at train start,
tools/train.py:85-90) — TPU-native: jax/flax/optax versions, devices,
backend, host info.
"""

import platform
import sys


def collect_env_info():
    lines = [f"python: {sys.version.split()[0]} ({platform.platform()})"]
    try:
        import jax
        lines.append(f"jax: {jax.__version__}")
        lines.append(f"backend: {jax.default_backend()}")
        lines.append(f"devices: {[str(d) for d in jax.devices()]}")
        lines.append(f"process: {jax.process_index()}/{jax.process_count()}")
    except Exception as e:
        lines.append(f"jax: unavailable ({e})")
    for mod in ("flax", "optax", "orbax.checkpoint", "numpy"):
        try:
            import importlib
            m = importlib.import_module(mod)
            lines.append(f"{mod}: {getattr(m, '__version__', '?')}")
        except Exception:
            pass
    try:
        from ..native import available
        lines.append(f"native decoders: {available()}")
    except Exception:
        pass
    return "\n".join(lines)


def device_memory_stats():
    """Per-device memory usage dict (bytes), when the backend reports it.

    TPU-native replacement for the reference TextLoggerHook's max-GPU-memory
    report (dmb/utils/text_logger.py:28-35).
    """
    import jax
    stats = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
            if s:
                stats[str(d)] = {
                    "bytes_in_use": s.get("bytes_in_use", 0),
                    "peak_bytes_in_use": s.get("peak_bytes_in_use", 0),
                }
        except Exception:
            pass
    return stats
