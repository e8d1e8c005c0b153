"""Weighted SSIM / L1 reconstruction loss (reference train/loss.py:15-151).

Functional redesign: the reference stashes the per-pixel stereo error on the
module (``previous_image_error``, loss.py:38-41,149) for the uncertainty head
to consume later; here :func:`wssim_loss` simply *returns* the error map
alongside the scalar loss.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import avg_pool2d, resize_bilinear

_K1 = 0.01**2
_K2 = 0.03**2


def ssim(x: jnp.ndarray, y: jnp.ndarray, k1: float = _K1, k2: float = _K2) -> jnp.ndarray:
    """Per-pixel SSIM over 3x3 average-pooled statistics (NHWC).

    Output is spatially smaller by 2 in each dimension (valid pooling),
    exactly like the reference (train/loss.py:43-74).
    """
    mu_x = avg_pool2d(x, 3)
    mu_y = avg_pool2d(y, 3)

    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y

    sigma_x = avg_pool2d(x * x, 3) - mu_xx
    sigma_y = avg_pool2d(y * y, 3) - mu_yy
    sigma_xy = avg_pool2d(x * y, 3) - mu_xy

    numerator = (2 * mu_xy + k1) * (2 * sigma_xy + k2)
    denominator = (mu_xx + mu_yy + k1) * (sigma_x + sigma_y + k2)
    return numerator / denominator


def dssim(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Structural dissimilarity, clamped to [0, 1] (train/loss.py:76-90)."""
    return jnp.clip((1 - ssim(x, y)) / 2, 0.0, 1.0)


def wssim_image_error(images: jnp.ndarray, recon: jnp.ndarray,
                      alpha: float = 0.85) -> jnp.ndarray:
    """Per-pixel weighted stereo error ``alpha*DSSIM + (1-alpha)*L1``.

    SSIM is per-channel, so the five pooled statistics of both views are
    computed by ONE stacked 30-channel pool instead of 2 views x 5 separate
    3-channel pools — identical values (reduce_window is channelwise), 10x
    fewer pool ops in the fwd+bwd graph.

    Args:
        images / recon: (B, H, W, 6) stereo pairs (left = ch 0:3, right 3:6).
        alpha: SSIM weight.

    Returns:
        (B, H, W, 2) per-view mean error (train/loss.py:96-131).
    """
    h, w = images.shape[1], images.shape[2]

    l1_error = jnp.abs(images - recon)

    x, y = images, recon
    pooled = avg_pool2d(
        jnp.concatenate([x, y, x * x, y * y, x * y], axis=-1), 3
    )
    mu_x, mu_y, m_xx, m_yy, m_xy = [
        pooled[..., 6 * i:6 * (i + 1)] for i in range(5)
    ]
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x = m_xx - mu_xx
    sigma_y = m_yy - mu_yy
    sigma_xy = m_xy - mu_xy
    ssim_map = ((2 * mu_xy + _K1) * (2 * sigma_xy + _K2)) / (
        (mu_xx + mu_yy + _K1) * (sigma_x + sigma_y + _K2)
    )
    ssim_error = jnp.clip((1 - ssim_map) / 2, 0.0, 1.0)
    ssim_error = resize_bilinear(ssim_error, (h, w))

    total = alpha * ssim_error + (1 - alpha) * l1_error

    left = jnp.mean(total[..., 0:3], axis=-1, keepdims=True)
    right = jnp.mean(total[..., 3:6], axis=-1, keepdims=True)
    return jnp.concatenate([left, right], axis=-1)


def wssim_loss(images: jnp.ndarray, recon: jnp.ndarray,
               alpha: float = 0.85) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Scalar WSSIM loss + the per-pixel error map (train/loss.py:133-151)."""
    error = wssim_image_error(images, recon, alpha)
    loss = jnp.mean(error[..., 0] + error[..., 1])
    return loss, error
