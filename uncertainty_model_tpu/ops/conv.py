"""Reflect-padded convolution without materialising the padded tensor.

The decoder applies ReflectionPad2d(1) before every 3x3 conv (reference
model/layers/decoder.py:38-44).  A materialised reflect pad relayouts the
whole activation into an unaligned (H+2, W+2) buffer — measured ~2x the cost
of the conv itself at full resolution on a v5e.  Instead: run the conv with
*internal* zero padding over the interior (no copy) and recompute only the
four border strips from reflect-padded 3-row/3-col slices, restitching with
two concatenates.  Bit-exact with pad-then-conv (golden tested).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .pad import pad2d

_DN = ("NHWC", "HWIO", "NHWC")


def conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1,
           padding="VALID") -> jnp.ndarray:
    """Plain NHWC conv (HWIO weights)."""
    return lax.conv_general_dilated(
        x, w, (stride, stride), padding, dimension_numbers=_DN
    )


def reflect_conv2d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 conv with 1-pixel reflection padding, same-size output.

    Equivalent to ``conv2d(pad2d(x, (1,1,1,1), 'reflect'), w)`` without the
    full-tensor pad copy.
    """
    if w.shape[0] != 3 or w.shape[1] != 3:
        return conv2d(pad2d(x, (1, 1, 1, 1), "reflect"), w)

    interior = conv2d(x, w)  # valid: (H-2, W-2)

    def rows(slice3):  # (B, 3, W, C) -> (B, 1, W, C), reflect-padded in W
        return conv2d(pad2d(slice3, (1, 1, 0, 0), "reflect"), w)

    def cols(slice3):  # (B, H, 3, C) -> (B, H, 1, C), reflect-padded in H
        return conv2d(pad2d(slice3, (0, 0, 1, 1), "reflect"), w)

    top = rows(jnp.concatenate([x[:, 1:2], x[:, 0:2]], axis=1))
    bottom = rows(jnp.concatenate([x[:, -2:], x[:, -2:-1]], axis=1))
    left = cols(jnp.concatenate([x[:, :, 1:2], x[:, :, 0:2]], axis=2))
    right = cols(jnp.concatenate([x[:, :, -2:], x[:, :, -2:-1]], axis=2))

    middle = jnp.concatenate([left[:, 1:-1], interior, right[:, 1:-1]], axis=2)
    return jnp.concatenate([top, middle, bottom], axis=1)
