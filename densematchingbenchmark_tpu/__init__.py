"""densematchingbenchmark_tpu: a TPU-native dense-matching (stereo) framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
DeepMotionAIResearch/DenseMatchingBenchmark (reference mounted read-only at
/root/reference), designed TPU-first:

- Channels-last layouts everywhere: images/features ``[B, H, W, C]``,
  cost volumes ``[B, D, H, W, C]`` (NDHWC) so XLA tiles convs onto the MXU.
- Everything jit-able with static shapes; models are Flax linen modules,
  losses and metrics are pure functions.
- Data parallelism (and cost-volume sharding) via ``jax.sharding`` meshes,
  not process-per-GPU launchers.
- bf16 compute / f32 params + accumulation by default on TPU.

Tensor conventions (used by every op below, documented once here):
  image / feature map   [B, H, W, C]        float
  cost volume (raw)     [B, D, H, W, C]     D = number of disparity samples
  cost volume (scored)  [B, D, H, W]        after aggregation & classification
  disparity map         [B, H, W, 1]
  per-pixel samples     [B, D, H, W]        disparity value of each sample
"""

__version__ = "0.1.0"
