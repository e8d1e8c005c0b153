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
    """Valid average pooling over H, W of an NHWC array.

    Separable (1xk then kx1) — k reads per output instead of k^2; the sum is
    exact up to f32 reassociation.
    """
    import numpy as np

    zero = np.zeros((), x.dtype)[()]  # literal: keeps the sum differentiable

    summed = lax.reduce_window(
        x, zero, lax.add, (1, kernel_size, 1, 1), (1, stride, 1, 1), "VALID"
    )
    summed = lax.reduce_window(
        summed, zero, lax.add, (1, 1, kernel_size, 1), (1, 1, stride, 1), "VALID"
    )
    return summed / (kernel_size * kernel_size)


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Global average over H, W -> (B, C)."""
    return jnp.mean(x, axis=(1, 2))
