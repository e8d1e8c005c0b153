"""uncertainty_model_tpu — a TPU-native (JAX/XLA/Pallas) framework for
self-supervised stereo depth + aleatoric uncertainty estimation.

Re-designed from scratch for TPU hardware with the same capabilities as the
reference PyTorch implementation (Probabilistic-Surgical-Vision/
uncertainty-model): a randomly-connected (Watts-Strogatz) CNN encoder with
efficient linear attention, a multi-scale disparity + uncertainty decoder,
Monodepth-style self-supervised stereo losses, optional adversarial training,
and AUSE/AURG sparsification evaluation.

Design stance (TPU-first, not a port):
  * NHWC layout everywhere (XLA:TPU native conv layout).
  * Pure-functional modules (flax.linen) — BatchNorm state is explicit.
  * One jitted train step closed over a ``jax.sharding.Mesh``; data
    parallelism via batch-axis sharding (XLA inserts the ICI collectives,
    giving exact cross-replica "sync BN" for free).
  * The hot stereo-warp kernel is a 1-D specialisation of grid_sample
    (vertical lerp + horizontal gather) with an optional Pallas TPU kernel.
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401
