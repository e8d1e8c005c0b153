"""Image-pyramid helpers (reference train/utils.py:27-62, 138-140).

``scale_pyramid`` and ``reconstruct_pyramid`` live in :mod:`..ops` (they are
numerics kernels); these are the remaining pyramid utilities from the
reference's API surface.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from jax import lax


def detach_pyramid(pyramid: Sequence[jnp.ndarray]) -> list[jnp.ndarray]:
    """Stop gradients through every level (reference train/utils.py:53-62)."""
    return [lax.stop_gradient(level) for level in pyramid]


def concatenate_pyramids(a: Sequence[jnp.ndarray],
                         b: Sequence[jnp.ndarray]) -> list[jnp.ndarray]:
    """Concatenate two pyramids along the batch axis (reference
    train/utils.py:138-140)."""
    return [jnp.concatenate([x, y], axis=0) for x, y in zip(a, b)]
