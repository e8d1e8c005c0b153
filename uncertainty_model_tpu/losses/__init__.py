from .wssim import ssim, dssim, wssim_image_error, wssim_loss  # noqa: F401
from .consistency import consistency_loss, l1_loss  # noqa: F401
from .smoothness import smoothness_loss, smoothness_error  # noqa: F401
from .reprojection import reprojection_error_loss  # noqa: F401
from .adversarial import (  # noqa: F401
    bce_loss,
    discriminator_loss,
    generator_loss,
    perceptual_loss,
)
from .total import TukraUncertaintyLoss  # noqa: F401
