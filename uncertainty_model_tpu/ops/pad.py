"""Spatial padding helpers (NHWC).

Covers the three padding modes the reference relies on: zero (encoder convs,
model/layers/encoder.py:42-48), reflect (decoder convs and NodeBlock resize,
model/layers/decoder.py:38, encoder.py:113) and replicate (smoothness-loss
gradients, train/loss.py:208-218).  ``jnp.pad`` supports all three natively.
"""

from __future__ import annotations

import jax.numpy as jnp

_MODES = {
    "zeros": "constant",
    "constant": "constant",
    "reflect": "reflect",
    "replicate": "edge",
    "edge": "edge",
}


def pad2d(
    x: jnp.ndarray,
    padding: tuple[int, int, int, int],
    mode: str = "zeros",
) -> jnp.ndarray:
    """Pad H and W of an NHWC array.

    ``padding`` follows the torch ``F.pad`` convention used throughout the
    reference: ``(left, right, top, bottom)``.
    """
    left, right, top, bottom = padding
    pad_width = [(0, 0)] * (x.ndim - 3) + [(top, bottom), (left, right), (0, 0)]
    return jnp.pad(x, pad_width, mode=_MODES[mode])
