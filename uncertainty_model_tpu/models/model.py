"""Full randomly-connected model (reference model/model.py).

``RandomlyConnectedModel.from_config(**config['model'])`` keeps the exact
kwargs surface of the reference so the same ``config.yml`` constructs it
(reference main.py:107).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .decoder import DepthDecoder
from .encoder import RandomEncoder


class RandomlyConnectedModel(nn.Module):
    encoder: RandomEncoder
    decoder: DepthDecoder

    @classmethod
    def from_config(cls, encoder: dict, decoder: dict, dtype=None,
                    s2d_stages=()) -> "RandomlyConnectedModel":
        """``dtype`` selects the on-device compute precision (bfloat16 for
        serving/mixed-precision training); parameters stay float32.
        ``s2d_stages`` runs those encoder stages' interiors space-to-depth
        (TPU layout optimisation; exact up to float reassociation)."""
        return cls(
            encoder=RandomEncoder.from_config(**encoder, dtype=dtype,
                                              s2d_stages=s2d_stages),
            decoder=DepthDecoder.from_config(**decoder, dtype=dtype),
        )

    def __call__(
        self, image: jnp.ndarray, disp_scale: float = 1.0, train: bool = False
    ) -> tuple[jnp.ndarray, ...]:
        encodings = self.encoder(image, train=train)
        return self.decoder(image, *encodings, disp_scale=disp_scale, train=train)
