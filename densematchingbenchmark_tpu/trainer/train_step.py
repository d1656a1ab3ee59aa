"""The jit-able training / evaluation step factories.

Replaces the reference's batch_processor + DistOptimizerHook combination
(dmb/apis/train.py:30-54, dmb/utils/dist_utils.py:52-66): forward, loss-dict
sum, grad, cross-device mean (implicit: the batch is sharded over the mesh's
data axis and jit partitions the summed loss, inserting the all-reduce XLA
way), clip, apply. BatchNorm stats computed under jit over the global
(sharded) batch reproduce apex syncBN semantics (dmb/apis/train.py:95-97)
with zero extra code.

Sharding model: "computation follows data" — the caller device_puts the
batch with parallel.mesh.shard_batch and keeps the state replicated;
jit+GSPMD partitions the step accordingly. No shard_map needed for DP.
"""

import jax
import jax.numpy as jnp


from ..losses.builder import total_loss


def make_train_step(model, tx, loss_evaluator, donate=True):
    """Returns train_step(state, batch) -> (state, metrics_dict).

    batch: dict with 'leftImage'/'rightImage' [B, H, W, 3] and 'leftDisp'
    [B, H, W, 1] (reference batch contract, general_stereo_model.py:44-46).
    """

    def step(state, batch):
        new_rng, step_rng = jax.random.split(state.rng)

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["leftImage"], batch["rightImage"], train=True,
                mutable=["batch_stats"],
                rngs={"patch_match": step_rng})
            loss_dict = loss_evaluator(
                out["disps"], out["costs"], batch["leftDisp"],
                variance=out.get("variances"),
                min_disparity=out.get("min_disparity"),
                max_disparity=out.get("max_disparity"))
            if "conf_costs" in out:
                loss_dict.update(loss_evaluator.cmn_loss(
                    out["conf_costs"], batch["leftDisp"]))
            loss = total_loss(loss_dict)
            return loss, (loss_dict, updates["batch_stats"])

        (loss, (loss_dict, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, tx, new_batch_stats=new_bs,
                                          new_rng=new_rng)
        metrics = {"loss": loss, **loss_dict,
                   "grad_norm": jnp.sqrt(sum(
                       jnp.sum(jnp.square(g))
                       for g in jax.tree.leaves(grads)))}
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model):
    """Returns eval_step(state, batch) -> results dict (device arrays)."""

    def step(state, batch):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["leftImage"], batch["rightImage"], train=False)

    return jax.jit(step)


def make_flow_train_step(model, tx, weights, donate=True):
    """Flow-task train step: same jit/GSPMD shape as make_train_step, with
    the multi-scale flow loss (the reference has no flow training at all —
    its flow registry is empty)."""
    from ..flow.losses import flow_l1_loss

    def step(state, batch):
        new_rng, _ = jax.random.split(state.rng)

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["leftImage"], batch["rightImage"], train=True,
                mutable=["batch_stats"])
            loss_dict = flow_l1_loss(out["flows"], batch["flow"], weights)
            return total_loss(loss_dict), (loss_dict,
                                           updates["batch_stats"])

        (loss, (loss_dict, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, tx, new_batch_stats=new_bs,
                                          new_rng=new_rng)
        metrics = {"loss": loss, **loss_dict,
                   "grad_norm": jnp.sqrt(sum(
                       jnp.sum(jnp.square(g))
                       for g in jax.tree.leaves(grads)))}
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())
