"""Randomly-connected discriminator (reference model/discriminator.py).

Four encoder stages consuming a stereo image pyramid (stage i > 0 eats the
previous stage's output concatenated with pyramid level i), a fifth stage as
the final conv, then a linear head + sigmoid.  ``features()`` exposes the
per-stage maps for the perceptual loss (reference discriminator.py:53-76).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .encoder import resolve_encoder_graphs
from .graph import GraphSpec
from .layers import EncoderStage, torch_fanin_uniform


class RandomDiscriminator(nn.Module):
    graphs: tuple[GraphSpec, ...]  # len(layers) + 1 (final conv stage)
    layers: tuple[tuple[int, int, int], ...]
    final_conv: tuple[int, int, int]
    linear_in_features: int
    dtype: object = None

    @classmethod
    def from_config(
        cls,
        layers: Sequence[dict],
        final_conv: dict,
        linear_in_features: int,
        load_graph: Optional[str] = None,
        nodes: int = 5,
        seed: int = 42,
        dtype=None,
    ) -> "RandomDiscriminator":
        graphs = resolve_encoder_graphs(
            len(layers) + 1, load_graph=load_graph, nodes=nodes, seed=seed
        )
        frozen = tuple(
            (cfg["out_channels"], cfg["kernel_size"], cfg.get("heads", 8))
            for cfg in layers
        )
        fc = (
            final_conv["out_channels"],
            final_conv["kernel_size"],
            final_conv.get("heads", 8),
        )
        return cls(
            graphs=graphs, layers=frozen, final_conv=fc,
            linear_in_features=linear_in_features, dtype=dtype,
        )

    def setup(self):
        self.stages = [
            EncoderStage(self.graphs[i], out_ch, kernel, heads=heads,
                         dtype=self.dtype, name=f"stage_{i}")
            for i, (out_ch, kernel, heads) in enumerate(self.layers)
        ]
        out_ch, kernel, heads = self.final_conv
        self.conv = EncoderStage(
            self.graphs[len(self.layers)], out_ch, kernel, heads=heads,
            dtype=self.dtype, name="final_conv"
        )
        self.linear = nn.Dense(
            1,
            kernel_init=torch_fanin_uniform(self.linear_in_features),
            bias_init=torch_fanin_uniform(self.linear_in_features),
            dtype=self.dtype,
            name="linear",
        )

    def features(self, pyramid: Sequence[jnp.ndarray], train: bool = False):
        """Per-stage feature maps from the image pyramid."""
        feats = []
        out = None
        if self.dtype is not None:
            pyramid = [p.astype(self.dtype) for p in pyramid]
        for i, (images, stage) in enumerate(zip(pyramid, self.stages)):
            if i == 0:
                out = stage(images, train=train)
            else:
                out = stage(jnp.concatenate([out, images], axis=-1), train=train)
            feats.append(out)
        return feats

    def __call__(self, pyramid: Sequence[jnp.ndarray], train: bool = False) -> jnp.ndarray:
        import jax

        feature = self.features(pyramid, train=train)[-1]
        out = self.conv(feature, train=train)
        out = out.reshape(out.shape[0], -1)  # NHWC flatten order
        return jax.nn.sigmoid(self.linear(out))
