"""Pallas TPU kernel: the encoder NodeBlock's gated input sum.

A graph node with k > 1 inputs consumes ``h = sum_i g_i * x_i`` (reference
model/layers/encoder.py:115-123; the g_i are per-input sigmoid scalars,
precomputed at build time by the serving compiler).  The round-4 perf
budget puts enc0's gating mul+add at ~10 ms against a ~4 ms byte floor
(docs/PERFORMANCE.md finding 5): XLA emits the chain as elementwise
fusions that run well off the HBM roofline on the batch-minor C=32 maps.

This kernel is one bandwidth-bound pass: read the k maps, write one.  Like
ops/pallas/decoder_fused.py it operates on the (H, W, C, B) view of the
batch-minor {0,3,2,1} conv activations, so the pallas boundary is a free
bitcast, and gates ride as an f32 (k, 1) VMEM operand (bf16 scalar
extracts are unsupported by Mosaic — see PERFORMANCE.md gotchas).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # tests flip this to exercise the kernel off-TPU


def _use_kernel() -> bool:
    return jax.default_backend() == "tpu" or _INTERPRET


def _kernel(g_ref, *refs, k):
    xs, out_ref = refs[:k], refs[k]
    acc = xs[0][...].astype(jnp.float32) * g_ref[0, 0]
    for i in range(1, k):
        acc = acc + xs[i][...].astype(jnp.float32) * g_ref[i, 0]
    out_ref[...] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gated_sum_pallas(gates, xs, interpret=False):
    k = len(xs)
    b, h, w, c = xs[0].shape
    xts = [jnp.transpose(x, (1, 2, 3, 0)) for x in xs]  # free bitcast

    cell = c * b * xs[0].dtype.itemsize
    wb = w
    while (wb > 16 and wb * cell > 4 * 1024 * 1024
           and w % (wb // 2) == 0):
        wb //= 2
    rows = 1
    while (rows * 2 <= 8 and h % (rows * 2) == 0
           and rows * 2 * wb * cell <= 4 * 1024 * 1024):
        rows *= 2

    blk = pl.BlockSpec((rows, wb, c, b), lambda i, j: (i, j, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, k=k),
        grid=(h // rows, w // wb),
        in_specs=[pl.BlockSpec((k, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM)] + [blk] * k,
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((h, w, c, b), xs[0].dtype),
        interpret=interpret,
    )(gates.reshape(k, 1).astype(jnp.float32), *xts)
    return jnp.transpose(out, (3, 0, 1, 2))


def gated_sum(gates, xs):
    """``sum_i gates[i] * xs[i]`` over k same-shape (B, H, W, C) maps.

    f32 accumulation (the flax path multiplies in the input dtype then
    adds; for bf16 inputs the f32 accumulate is a strict accuracy
    improvement and tests pin rtol)."""
    if not _use_kernel():
        acc = xs[0].astype(jnp.float32) * gates[0]
        for i in range(1, len(xs)):
            acc = acc + xs[i].astype(jnp.float32) * gates[i]
        return acc.astype(xs[0].dtype)
    return _gated_sum_pallas(gates, tuple(xs), interpret=_INTERPRET)
