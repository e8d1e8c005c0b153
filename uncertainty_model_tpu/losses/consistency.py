"""Left-right consistency loss (Godard et al. 1609.03677; reference
train/loss.py:154-188)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..ops import reconstruct_left_image, reconstruct_right_image


def l1_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error (reference train/utils.py:22-24)."""
    return jnp.mean(jnp.abs(x - y))


def consistency_loss(disp: jnp.ndarray, images: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """LR-consistency between the two views of a 2-channel map.

    When ``images`` is given, ``disp`` acts as the warp field over ``images``
    — the reference reuses this with (uncertainty, disparity) for the
    uncertainty-consistency term (train/loss.py:430-431), warp-field quirk
    included.
    """
    if images is None:
        images = disp

    left_disp = disp[..., 0:1]
    right_disp = disp[..., 1:2]
    left_image = images[..., 0:1]
    right_image = images[..., 1:2]

    left_lr = reconstruct_left_image(left_disp, right_image)
    right_lr = reconstruct_right_image(right_disp, left_image)

    return l1_loss(left_disp, left_lr) + l1_loss(right_disp, right_lr)
