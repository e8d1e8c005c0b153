"""Edge-aware disparity smoothness loss (Godard et al. 1609.03677;
reference train/loss.py:191-264)."""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import pad2d


def gradient_x(x: jnp.ndarray) -> jnp.ndarray:
    """Forward difference along W with replicate padding (loss.py:208-212)."""
    x = pad2d(x, (0, 1, 0, 0), mode="replicate")
    return x[:, :, :-1, :] - x[:, :, 1:, :]


def gradient_y(x: jnp.ndarray) -> jnp.ndarray:
    """Forward difference along H with replicate padding (loss.py:214-218)."""
    x = pad2d(x, (0, 0, 0, 1), mode="replicate")
    return x[:, :-1, :, :] - x[:, 1:, :, :]


def _weights(image_gradient: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(-jnp.mean(jnp.abs(image_gradient), axis=-1, keepdims=True))


def smoothness_error(disparity: jnp.ndarray, image: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel edge-weighted |grad disparity| (loss.py:226-246)."""
    smooth_x = gradient_x(disparity) * _weights(gradient_x(image))
    smooth_y = gradient_y(disparity) * _weights(gradient_y(image))
    return jnp.abs(smooth_x) + jnp.abs(smooth_y)


def smoothness_loss(disp: jnp.ndarray, images: jnp.ndarray) -> jnp.ndarray:
    """Stereo smoothness loss.

    ``disp`` is (B, H, W, 2); ``images`` is split into two views of equal
    channel count (3+3 for RGB stereo, 1+1 when the reference reuses this
    for uncertainty-vs-pooled-images, loss.py:248-264).
    """
    half = images.shape[-1] // 2
    left = smoothness_error(disp[..., 0:1], images[..., :half])
    right = smoothness_error(disp[..., 1:2], images[..., half:])
    return jnp.mean(left + right)
