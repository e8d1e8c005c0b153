"""Multi-scale disparity + uncertainty decoder (reference model/decoder.py).

Five DecoderStages with the reference's hard-wired dataflow
(model/decoder.py:49-57): the deepest feature map is its own skip; disparity
first appears at stage index 1 (1/8 resolution) and is threaded upward.
Each disparity map has 4 channels: [left_disp, right_disp, left_unc,
right_unc], sigmoid-bounded and multiplied by the runtime curriculum scale.

Always returns the full 4-scale tuple (full, 1/2, 1/4, 1/8 resolution);
evaluation uses index 0 (the reference's eval mode returns only disp1,
model/decoder.py:59-62 — the lower heads are intermediates either way, so
returning them is free).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import DecoderStage

# DecoderStage construction kwargs accepted from config.yml (reference
# model/layers/decoder.py:171-181).
_STAGE_KEYS = (
    "in_channels", "feature_in_channels", "skip_in_channels",
    "upsample_channels", "out_channels", "skip_out_channels",
    "disp_channels", "batch_norm", "fc", "scale", "concat_disp",
    "calculate_disp",
)


def _freeze_stage_config(cfg: dict) -> tuple:
    return tuple((k, cfg[k]) for k in _STAGE_KEYS if k in cfg)


class DepthDecoder(nn.Module):
    """Decoder over a tuple of frozen per-stage configs."""

    layers: tuple[tuple, ...]
    dtype: object = None

    @classmethod
    def from_config(cls, layers: Sequence[dict], dtype=None) -> "DepthDecoder":
        return cls(layers=tuple(_freeze_stage_config(cfg) for cfg in layers),
                   dtype=dtype)

    @nn.compact
    def __call__(
        self,
        left_image: jnp.ndarray,
        *feature_maps: jnp.ndarray,
        disp_scale: float = 1.0,
        train: bool = False,
    ) -> tuple[jnp.ndarray, ...]:
        stages = [
            DecoderStage(**dict(cfg), dtype=self.dtype, name=f"stage_{i}")
            for i, cfg in enumerate(self.layers)
        ]
        if self.dtype is not None:
            left_image = left_image.astype(self.dtype)

        f1, f2, f3, f4, x4 = feature_maps

        out5, skip5, _ = stages[0](x4, f4, x4, disp_scale=disp_scale, train=train)
        out4, skip4, disp4 = stages[1](out5, f3, skip5, disp_scale=disp_scale, train=train)
        out3, skip3, disp3 = stages[2](out4, f2, skip4, disp4, disp_scale, train=train)
        out2, skip2, disp2 = stages[3](out3, f1, skip3, disp3, disp_scale, train=train)
        _, _, disp1 = stages[4](out2, left_image, skip2, disp2, disp_scale, train=train)

        return disp1, disp2, disp3, disp4
