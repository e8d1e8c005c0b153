"""Randomly-connected encoder (reference model/encoder.py).

Five EncoderStages, each halving H and W; returns all five feature maps.
Constructed from the same ``config.yml`` kwargs surface as the reference
(``layers`` list of per-stage dicts + ``load_graph``/``nodes``/``seed``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .graph import GraphSpec, resolve_stage_graph
from .layers import EncoderStage


def resolve_encoder_graphs(
    num_stages: int,
    load_graph: Optional[str] = None,
    nodes: int = 5,
    seed: int = 42,
    p: float = 0.75,
    k: int = 4,
    save_graph: Optional[str] = None,
    first_stage: int = 1,
) -> tuple[GraphSpec, ...]:
    """Host-side resolution of the per-stage graph topologies.

    Stage numbering starts at 1 (reference model/encoder.py:33-36 passes
    ``stage=i+1``); fresh builds seed with ``stage * seed``.
    """
    return tuple(
        resolve_stage_graph(
            stage, nodes=nodes, p=p, k=k, seed=seed,
            load_graph=load_graph, save_graph=save_graph,
        )
        for stage in range(first_stage, first_stage + num_stages)
    )


class RandomEncoder(nn.Module):
    """Encoder over a tuple of per-stage (graph, config) pairs."""

    graphs: tuple[GraphSpec, ...]
    layers: tuple[tuple[int, int, int], ...]  # per-stage (out_channels, kernel_size, heads)
    s2d_stages: tuple[int, ...] = ()  # stages whose interior runs space-to-depth
    dtype: Optional[Any] = None

    @classmethod
    def from_config(
        cls,
        layers: Sequence[dict],
        load_graph: Optional[str] = None,
        nodes: int = 5,
        seed: int = 42,
        save_graph: Optional[str] = None,
        s2d_stages: Sequence[int] = (),
        dtype: Optional[Any] = None,
    ) -> "RandomEncoder":
        graphs = resolve_encoder_graphs(
            len(layers), load_graph=load_graph, nodes=nodes, seed=seed,
            save_graph=save_graph,
        )
        frozen = tuple(
            (cfg["out_channels"], cfg["kernel_size"], cfg.get("heads", 8))
            for cfg in layers
        )
        return cls(graphs=graphs, layers=frozen,
                   s2d_stages=tuple(s2d_stages), dtype=dtype)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> tuple[jnp.ndarray, ...]:
        encodings = []
        out = x
        if self.dtype is not None:
            out = out.astype(self.dtype)
        for i, (graph, (out_ch, kernel, heads)) in enumerate(zip(self.graphs, self.layers)):
            out = EncoderStage(
                graph, out_ch, kernel, heads=heads,
                s2d=(i in self.s2d_stages and kernel >= 5),
                dtype=self.dtype, name=f"stage_{i}",
            )(out, train=train)
            encodings.append(out)
        return tuple(encodings)
