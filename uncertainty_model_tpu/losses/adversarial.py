"""Adversarial losses (reference train/loss.py:267-337, train/utils.py:248-273).

All functions take ``disc_apply``: a callable ``(pyramid, train) ->
predictions`` or ``(pyramid, train, method='features') -> feature list``
closed over the discriminator's (possibly lagged) parameters — the functional
equivalent of the reference's ``disc_clone`` module.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .consistency import l1_loss

_LOG_CLAMP = -100.0  # torch BCELoss clamps log terms at -100


def bce_loss(predictions: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    log_p = jnp.maximum(jnp.log(predictions), _LOG_CLAMP)
    log_1p = jnp.maximum(jnp.log(1 - predictions), _LOG_CLAMP)
    return -jnp.mean(labels * log_p + (1 - labels) * log_1p)


def generator_loss(recon_pyramid, disc_apply, loss_type: str = "mse") -> jnp.ndarray:
    """Convince the discriminator that reconstructions are real
    (train/loss.py:308-337)."""
    predictions = disc_apply(recon_pyramid)
    labels = jnp.ones_like(predictions)
    if loss_type == "mse":
        return jnp.mean((predictions - labels) ** 2)
    return bce_loss(predictions, labels)


def perceptual_loss(image_pyramid, recon_pyramid, disc_features) -> jnp.ndarray:
    """L1 between discriminator features of real vs reconstructed pyramids
    (train/loss.py:267-305)."""
    image_maps = disc_features(image_pyramid)
    recon_maps = disc_features(recon_pyramid)
    loss = 0.0
    for image_map, recon_map in zip(image_maps, recon_maps):
        loss = loss + l1_loss(image_map, recon_map)
    return loss


def discriminator_loss(image_pyramid, recon_pyramid, disc_apply,
                       batch_size: int) -> jnp.ndarray:
    """Real-vs-fake BCE over batch-concatenated pyramids, halved
    (train/utils.py:248-273)."""
    recon_pyramid = [lax.stop_gradient(r) for r in recon_pyramid]
    pyramid = [
        jnp.concatenate([a, b], axis=0)
        for a, b in zip(image_pyramid, recon_pyramid)
    ]
    predictions = disc_apply(pyramid)
    labels = jnp.concatenate(
        [jnp.ones((batch_size, 1)), jnp.zeros((predictions.shape[0] - batch_size, 1))],
        axis=0,
    )
    return bce_loss(predictions, labels) / 2
