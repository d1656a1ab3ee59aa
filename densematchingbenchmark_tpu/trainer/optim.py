"""Optimizer + LR schedule builder (optax).

Parity targets:
  dmb/utils/solver.py:6-70 (build_optimizer: RMSprop etc. from config)
  mmcv LrUpdaterHook step policy with linear warmup, as configured in every
  reference config (e.g. configs/PSMNet/scene_flow.py:134-143):
    warmup='linear', warmup_iters=500, warmup_ratio=1/3, step=[10] epochs.

mmcv linear warmup: lr_t = base * (1 - (1 - t/warmup_iters) * (1 - ratio))
for t < warmup_iters; afterwards the epoch-step decay lr = base * gamma^k
where k = #milestones passed. Milestones are epochs -> converted to steps
with steps_per_epoch.
"""

import optax


def make_lr_schedule(base_lr, schedule_cfg, steps_per_epoch):
    warmup_iters = schedule_cfg.get("warmup_iters", 0)
    warmup_ratio = schedule_cfg.get("warmup_ratio", 1.0)
    gamma = schedule_cfg.get("gamma", 0.1)
    milestones = [int(e * steps_per_epoch)
                  for e in schedule_cfg.get("step", ())]

    def schedule(step):
        import jax.numpy as jnp
        step = jnp.asarray(step)
        decayed = base_lr
        for m in milestones:
            decayed = jnp.where(step >= m, decayed * gamma, decayed)
        if warmup_iters > 0:
            frac = jnp.minimum(step / warmup_iters, 1.0)
            warm = 1.0 - (1.0 - frac) * (1.0 - warmup_ratio)
            decayed = decayed * warm
        return decayed

    return schedule


def build_optimizer(cfg, steps_per_epoch):
    """cfg['optimizer'] + cfg['lr_schedule'] + cfg['grad_clip'] -> optax tx.

    Returns (tx, schedule) — schedule exposed for logging.
    """
    opt_cfg = cfg["optimizer"]
    schedule = make_lr_schedule(opt_cfg["lr"], cfg.get("lr_schedule", {}),
                                steps_per_epoch)
    kind = opt_cfg.get("type", "rmsprop").lower()
    if kind == "rmsprop":
        # torch.optim.RMSprop defaults: alpha=0.99, eps=1e-8, momentum=0
        opt = optax.rmsprop(schedule, decay=opt_cfg.get("alpha", 0.99),
                            eps=opt_cfg.get("eps", 1e-8),
                            momentum=opt_cfg.get("momentum", 0.0))
    elif kind == "adam":
        opt = optax.adam(schedule, b1=opt_cfg.get("beta1", 0.9),
                         b2=opt_cfg.get("beta2", 0.999))
    elif kind == "sgd":
        opt = optax.sgd(schedule, momentum=opt_cfg.get("momentum", 0.9))
    else:
        raise ValueError(f"unknown optimizer {kind}")

    chain = []
    clip = cfg.get("grad_clip")
    if clip:
        # reference clips grads at global norm 35 (optimizer_config)
        chain.append(optax.clip_by_global_norm(clip["max_norm"]))
    chain.append(opt)
    paramwise = opt_cfg.get("paramwise_options")
    if paramwise:
        chain.append(_paramwise_scale(paramwise))
    return optax.chain(*chain), schedule


def _paramwise_scale(options):
    """Per-parameter LR/weight-decay multipliers.

    Parity: dmb/utils/solver.py paramwise_options — bias_lr_mult scales
    biases' updates, norm_lr_mult scales normalization params (BatchNorm
    scale/bias). Applied as a post-update scaling (update magnitude ∝ lr).
    """
    bias_mult = options.get("bias_lr_mult", 1.0)
    norm_mult = options.get("norm_lr_mult", 1.0)

    def classify(path):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        in_norm = any("BatchNorm" in str(k) for k in keys)
        if in_norm:
            return norm_mult
        if keys and str(keys[-1]) == "bias":
            return bias_mult
        return 1.0

    def update_fn(updates, state, params=None):
        import jax
        flat = jax.tree_util.tree_flatten_with_path(updates)
        scaled = [leaf * classify(path) for path, leaf in flat[0]]
        return jax.tree_util.tree_unflatten(flat[1], scaled), state

    import optax as _optax
    return _optax.GradientTransformation(lambda params: _optax.EmptyState(),
                                         update_fn)
