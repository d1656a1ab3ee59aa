"""Eval-metric formatting: pandas table (disparity-id x metric).

Parity target: DistStereoEvalHook.evaluate's pandas rendering
(eval_hooks.py:75-114): rows = disparity ids, column groups =
{all, occ, noc} x {1px..5px, epe}.
"""

import re


def metrics_table(results):
    """{'disp_0/epe': v, 'disp_0/occ_epe': ...} -> formatted string."""
    try:
        import pandas as pd
    except ImportError:
        return "\n".join(f"{k}: {v:.4f}" for k, v in sorted(results.items()))

    rows = {}
    for key, val in results.items():
        m = re.match(r"disp_(\d+)/(?:(occ|noc)_)?(\w+)", key)
        if not m:
            continue
        did, region, metric = m.groups()
        region = region or "all"
        rows.setdefault(f"disp_{did}", {})[f"{region}/{metric}"] = val
    if not rows:
        return "(no metrics)"
    df = pd.DataFrame.from_dict(rows, orient="index")
    order = sorted(df.columns, key=lambda c: (
        {"all": 0, "occ": 1, "noc": 2}[c.split("/")[0]], c))
    return df[order].round(4).to_string()


def combine_shard_metrics(avg_metrics, count):
    """Combine per-host (averaged metrics, sample count) across processes.

    Single-process: identity. Multi-host: converts to sums, allgathers via
    multihost_utils.process_allgather (the TPU-native replacement for the
    reference's pickle-file gather, eval_hooks.py:184-198), and re-averages.
    """
    import jax
    if jax.process_count() == 1:
        return avg_metrics, count
    import numpy as np
    from jax.experimental import multihost_utils

    # Key sets can differ across shards (a stride shard past the dataset
    # end gets zero samples and {} metrics — ADVICE r3). Agree on the key
    # UNION first so every process gathers an identically-shaped vector.
    blob = np.frombuffer("\n".join(sorted(avg_metrics)).encode(), np.uint8)
    lens = multihost_utils.process_allgather(np.int64(blob.size))
    maxlen = int(np.max(lens))
    if maxlen == 0:
        return avg_metrics, count
    padded = np.zeros(maxlen, np.uint8)
    padded[:blob.size] = blob
    blobs = multihost_utils.process_allgather(padded)
    keys = set()
    for row, n in zip(np.asarray(blobs), np.asarray(lens).reshape(-1)):
        text = bytes(row[:int(n)]).decode()
        keys.update(k for k in text.split("\n") if k)
    keys = sorted(keys)

    vec = np.asarray(
        [avg_metrics.get(k, 0.0) * count for k in keys] + [count], np.float64)
    gathered = multihost_utils.process_allgather(vec)
    total = gathered.sum(axis=0)
    n = max(total[-1], 1.0)
    return {k: v / n for k, v in zip(keys, total[:-1])}, int(total[-1])
