"""PixelShuffle for NHWC arrays.

The decoder upsamples via ``PixelShuffle(2)`` after a conv that produces
``C * r**2`` channels (reference model/layers/decoder.py:188-192).  On TPU
this is a pure reshape/transpose that XLA fuses into the surrounding convs.

Channel-order parity with torch: the input channel index decomposes as
``c * r**2 + i * r + j`` -> output channel ``c`` at spatial offset ``(i, j)``.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, upscale_factor: int) -> jnp.ndarray:
    """Rearrange (B, H, W, C*r^2) -> (B, H*r, W*r, C)."""
    r = upscale_factor
    b, h, w, c_r2 = x.shape
    c = c_r2 // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c)
