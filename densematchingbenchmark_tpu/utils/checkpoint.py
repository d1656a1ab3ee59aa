"""Checkpoint / resume via orbax.

Parity target: the reference's epoch .pth checkpoints + runner.resume
(dmb/apis/train.py:176-179, tools/train.py:108-112): we save the full
TrainState (params, batch stats, optimizer state, step, PRNG) plus metadata
(epoch, batch_in_epoch, config) and restore deterministically. The
(epoch, batch_in_epoch) pair gives EXACT mid-epoch resume: the trainer
skips ahead through the epoch-seeded deterministic sampler
(data/loader.py epoch(start=)), reproducing the uninterrupted batch
sequence — the reference restarts the interrupted epoch instead.
"""

import os

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, work_dir, max_to_keep=5):
        path = os.path.abspath(os.path.join(work_dir, "checkpoints"))
        os.makedirs(path, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            path, options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True))

    def save(self, step, state, metadata=None, overwrite=False):
        """overwrite=True replaces an existing checkpoint at ``step``
        (orbax otherwise silently skips already-saved steps)."""
        if overwrite and step in self.manager.all_steps():
            self.manager.delete(step)
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            **({"metadata": ocp.args.JsonSave(metadata)}
               if metadata is not None else {}))
        saved = self.manager.save(step, args=args)
        self.manager.wait_until_finished()
        return saved

    def latest_step(self):
        return self.manager.latest_step()

    def restore(self, state_template, step=None):
        """Returns (state, metadata) restored at ``step`` (default latest)."""
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None, None
        restored = self.manager.restore(
            step, args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template),
                metadata=ocp.args.JsonRestore()))
        return restored["state"], restored.get("metadata")
