"""Pallas TPU kernels for the hot ops.

Each kernel has an XLA reference implementation in ops/ (the correctness
oracle); parity tests run the kernels in interpreter mode on CPU.
"""

from .soft_argmin_kernel import fused_soft_argmin
from .upsample_argmin_kernel import fused_upsample_soft_argmin

__all__ = ["fused_soft_argmin", "fused_upsample_soft_argmin"]
