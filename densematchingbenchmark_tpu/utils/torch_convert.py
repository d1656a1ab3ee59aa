"""Convert reference (PyTorch) weights into this framework's Flax params.

Enables (a) loading the reference's published .pth checkpoints, and
(b) activation-level parity testing: run the reference module and the Flax
module with identical weights and diff the outputs
(tests/test_reference_parity.py).

Mapping strategy: both frameworks yield parameters in *creation order*
(torch named_parameters follows __init__ definition order; Flax dicts
preserve insertion order from init tracing), and the Flax modules were
written to create layers in the reference's definition order. So a 1:1
order-based pairing with per-kind layout rules suffices:

  Conv2d  weight [O, I, kh, kw]        -> kernel [kh, kw, I, O]
  Conv3d  weight [O, I, kd, kh, kw]    -> kernel [kd, kh, kw, I, O]
  ConvTranspose2d/3d weight [I, O, k*] -> kernel [k*(flipped), I, O]
      (torch's transposed conv applies the spatially *flipped* kernel
       relative to an input-dilated forward conv, which is what
       ConvTransposeExact computes)
  BatchNorm weight/bias                -> scale/bias
  BatchNorm running_mean/var (buffers) -> batch_stats mean/var
"""

import numpy as np


def _flatten(tree, prefix=()):
    """DFS in dict insertion order -> [(path tuple, leaf)]."""
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.extend(_flatten(v, prefix + (k,)))
    else:
        out.append((prefix, tree))
    return out


def _unflatten(items):
    root = {}
    for path, leaf in items:
        node = root
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf
    return root


def _param_kinds(torch_module):
    """{qualified param name: owning module class name} via introspection
    (shape alone cannot distinguish ConvTranspose with I == O)."""
    kinds = {}
    for mname, m in torch_module.named_modules():
        cls = type(m).__name__
        for pname, _ in m.named_parameters(recurse=False):
            full = f"{mname}.{pname}" if mname else pname
            kinds[full] = cls
    return kinds


def _convert_weight(torch_name, kind, w, target_shape):
    """Apply the layout rule for the module kind; verify the shape."""
    w = np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w,
                   np.float32)
    transposed = kind.startswith("ConvTranspose")
    if w.ndim == 4:
        if transposed:   # [I, O, kh, kw] -> flipped [kh, kw, I, O]
            cand = np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]
        else:            # Conv2d [O, I, kh, kw]
            cand = np.transpose(w, (2, 3, 1, 0))
    elif w.ndim == 5:
        if transposed:   # [I, O, kd, kh, kw] -> flipped [k*, I, O]
            cand = np.transpose(w, (2, 3, 4, 0, 1))[::-1, ::-1, ::-1]
        else:            # Conv3d [O, I, kd, kh, kw]
            cand = np.transpose(w, (2, 3, 4, 1, 0))
    else:
        cand = w
    if cand.shape != tuple(target_shape):
        raise ValueError(
            f"{torch_name} ({kind}): converted shape {cand.shape} != flax "
            f"{tuple(target_shape)}")
    return np.ascontiguousarray(cand)


def reorder_params(named, module_order=None, child_orders=None):
    """Reorder a [(name, tensor)] list to match the Flax creation order.

    module_order: desired order of top-level submodule names (for modules
      whose definition order differs from the Flax call order, e.g.
      HWHourglass defines conv{1,2,3}_d interleaved while the Flax module
      creates downs then ups).
    child_orders: {parent_prefix: [child names in desired order]} — the
      same reordering applied to a nested submodule's children (entries
      for one parent are contiguous, so its slice is permuted in place).
    """
    named = list(named)
    if child_orders:
        for parent, order in child_orders.items():
            pre = parent + "."
            idxs = [i for i, (n, _) in enumerate(named)
                    if n.startswith(pre)]
            if not idxs:
                continue
            seg = [named[i] for i in idxs]

            def child_rank(item):
                child = item[0][len(pre):].split(".")[0]
                return (order.index(child) if child in order
                        else len(order))

            seg.sort(key=child_rank)  # stable within a child
            for i, item in zip(idxs, seg):
                named[i] = item
    if module_order:
        groups = {}
        rest = []
        for name, t in named:
            top = name.split(".")[0]
            (groups.setdefault(top, []) if top in module_order
             else rest).append((name, t))
        named = []
        for top in module_order:
            named.extend(groups.get(top, []))
        named += rest
    return named


def convert_module(torch_module, flax_variables, skip_torch=(),
                   torch_module_order=None, torch_child_orders=None):
    """Order-based conversion of one torch module's weights into the Flax
    variables dict (same architecture required).

    Args:
      torch_module: the reference nn.Module.
      flax_variables: {'params': ..., 'batch_stats': ...} from model.init.
      skip_torch: substrings of torch param names to skip (e.g. the frozen
        disparity-regression conv of FasterSoftArgmin).

    Returns: new variables dict with converted weights.
    """
    tparams = [(n, p) for n, p in torch_module.named_parameters()
               if not any(s in n for s in skip_torch)]
    if torch_module_order or torch_child_orders:
        tparams = reorder_params(tparams, torch_module_order,
                                 torch_child_orders)
    fparams = _flatten(dict(flax_variables["params"]))
    if len(tparams) != len(fparams):
        raise ValueError(
            f"param count mismatch: torch {len(tparams)} vs flax "
            f"{len(fparams)}\n  torch: {[n for n, _ in tparams][:8]}...\n"
            f"  flax: {['/'.join(p) for p, _ in fparams][:8]}...")
    kinds = _param_kinds(torch_module)
    new_params = []
    for (tname, tw), (fpath, fleaf) in zip(tparams, fparams):
        new_params.append((fpath, _convert_weight(
            tname, kinds.get(tname, ""), tw, fleaf.shape)))

    import jax.numpy as jnp
    out = {"params": _unflatten(
        [(p, jnp.asarray(v)) for p, v in new_params])}

    if "batch_stats" in flax_variables:
        tbufs = [(n, b) for n, b in torch_module.named_buffers()
                 if "running_mean" in n or "running_var" in n]
        if torch_module_order or torch_child_orders:
            tbufs = reorder_params(tbufs, torch_module_order,
                                   torch_child_orders)
        fbufs = _flatten(dict(flax_variables["batch_stats"]))
        if len(tbufs) != len(fbufs):
            raise ValueError(f"batch-stat count mismatch: torch "
                             f"{len(tbufs)} vs flax {len(fbufs)}")
        stats = []
        for (tname, tb), (fpath, fleaf) in zip(tbufs, fbufs):
            v = np.asarray(tb.detach().cpu().numpy(), np.float32)
            if v.shape != fleaf.shape:
                raise ValueError(f"{tname}: stat shape {v.shape} != "
                                 f"{fleaf.shape}")
            stats.append((fpath, jnp.asarray(v)))
        out["batch_stats"] = _unflatten(stats)
    return out
