"""Pooling primitives (NHWC).

The reference uses stride-1 valid ``AvgPool2d`` in SSIM (3x3, train/loss.py:34)
and sparsification (11x11, train/sparsification.py:13), plus
``AdaptiveAvgPool2d(1)`` in the squeeze-excite layer (model/layers/
decoder.py:111).  ``lax.reduce_window`` maps these directly onto the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def avg_pool2d(x: jnp.ndarray, kernel_size: int, stride: int = 1) -> jnp.ndarray:
    """Valid average pooling over H, W of an NHWC array."""
    window = (1, kernel_size, kernel_size, 1)
    strides = (1, stride, stride, 1)
    # init must be a literal zero for XLA's differentiable sum pattern
    import numpy as np

    summed = lax.reduce_window(x, np.zeros((), x.dtype)[()], lax.add, window, strides, "VALID")
    return summed / (kernel_size * kernel_size)


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Global average over H, W -> (B, C)."""
    return jnp.mean(x, axis=(1, 2))
