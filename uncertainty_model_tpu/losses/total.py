"""Composite training loss (reference train/loss.py:437-568,
``TukraUncertaintyLoss``).

Per pyramid scale i: WSSIM reconstruction + LR-consistency + smoothness/2^i
+ predictive-error (uncertainty) loss; optionally generator + (after
``perceptual_start``) perceptual losses against a lagged discriminator.

Returns ``(total_disparity_loss, total_error_loss)`` separately, like the
reference, so the trainer can log them independently.

Note the reference's gating quirk (train/train.py:124): the *batch index
within the epoch* is passed as the loss's ``epoch`` argument, so
``perceptual_start=5`` skips the perceptual term for the first 5 batches of
every epoch.  We keep that semantic (the ``step`` argument here is the batch
index) and evaluate the gate with ``lax.cond`` so the skipped branch costs
nothing at runtime.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax.numpy as jnp
from jax import lax

from .adversarial import generator_loss, perceptual_loss
from .consistency import consistency_loss, l1_loss
from .reprojection import reprojection_error_loss
from .smoothness import smoothness_loss
from .wssim import wssim_loss


@dataclasses.dataclass(frozen=True)
class TukraUncertaintyLoss:
    """Config mirrors the reference constructor kwargs (config.yml `loss`)."""

    wssim_weight: float = 1.0
    consistency_weight: float = 1.0
    smoothness_weight: float = 1.0
    adversarial_weight: float = 0.85
    predictive_error_weight: float = 1.0
    perceptual_weight: float = 0.05
    wssim_alpha: float = 0.85
    perceptual_start: int = 5
    adversarial_loss_type: str = "mse"
    error_loss_config: Optional[dict] = None

    def __call__(
        self,
        image_pyramid: Sequence[jnp.ndarray],
        predictions: Sequence[jnp.ndarray],
        recon_pyramid: Sequence[jnp.ndarray],
        step: Optional[jnp.ndarray] = None,
        disc_apply: Optional[Callable] = None,
        disc_features: Optional[Callable] = None,
        lr_pyramid: Optional[Sequence[jnp.ndarray]] = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """``lr_pyramid``: optional precomputed LR-consistency warps (the
        trainer fuses them into the reconstruction warp,
        ops/warp.py reconstruct_pyramid_with_lr — identical values, one warp
        kernel instead of two).  When absent the warps run here."""
        error_cfg = dict(self.error_loss_config or {})

        reprojection = 0.0
        consistency = 0.0
        smoothness = 0.0
        error_loss = 0.0

        for i, (images, prediction, recon) in enumerate(
            zip(image_pyramid, predictions, recon_pyramid)
        ):
            disparity = prediction[..., :2]

            scale_wssim, image_error = wssim_loss(images, recon, self.wssim_alpha)
            reprojection = reprojection + scale_wssim
            if lr_pyramid is not None:
                lr = lr_pyramid[i]
                consistency = consistency + (
                    l1_loss(disparity[..., 0:1], lr[..., 0:1])
                    + l1_loss(disparity[..., 1:2], lr[..., 1:2])
                )
            else:
                consistency = consistency + consistency_loss(disparity)
            smoothness = smoothness + smoothness_loss(disparity, images) / (2**i)
            error_loss = error_loss + reprojection_error_loss(
                prediction, images, image_error, **error_cfg
            )

        adversarial = 0.0
        perceptual = 0.0
        if disc_apply is not None:
            adversarial = generator_loss(
                recon_pyramid, disc_apply, self.adversarial_loss_type
            )
            if step is not None:
                perceptual = lax.cond(
                    step >= self.perceptual_start,
                    lambda: perceptual_loss(image_pyramid, recon_pyramid, disc_features),
                    lambda: jnp.zeros(()),
                )

        total_disparity_loss = (
            reprojection * self.wssim_weight
            + consistency * self.consistency_weight
            + smoothness * self.smoothness_weight
            + adversarial * self.adversarial_weight
            + perceptual * self.perceptual_weight
        )
        total_error_loss = error_loss * self.predictive_error_weight

        return total_disparity_loss, total_error_loss
