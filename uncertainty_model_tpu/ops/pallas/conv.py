"""Pallas TPU kernel: stride-1 SAME conv for the s2d-domain encoder interior.

Why this exists: inside the full serving graph, XLA's conv emitter picks a
pathological window config for the encoder stage-0 interior convs (7x7,
C=32, 128x256 @ batch 128) — its own cost model reports 259.9M estimated
cycles for three of the four structurally identical convs vs 11.0M for the
fourth (~8% MXU utilisation; docs/PERFORMANCE.md).  The same conv compiled
in isolation runs at 46%, and its space-to-depth form (ops/s2d.py: 5x5 conv,
C=Co=128) at 81% — the pathology is a graph-context layout/fusion outcome,
not a property of the shape.  A pallas_call is a layout black box: operands
and results get standard layouts, so wrapping the interior convs in this
kernel pins the fast behaviour regardless of surrounding context.

Formulation (implicit GEMM, no im2col materialisation):

    out[i, j, :] = sum_{u,v}  x[i+u-p, j+v-p, :] @ w[u, v, :, :]

One program per batch element; the block carries the whole (pre-padded)
image, so patch slices are free sublane offsets and each (u, v) tap is one
(H*W, C) @ (C, Co) MXU matmul accumulated in f32.  Bias and optional ELU
fuse into the epilogue.

Reference semantics: model/layers/encoder.py:41-48 (ConvELUBlock: zero-pad
SAME conv + bias; BN folds into w/b at serving build time), optionally on
the s2d tensor layout of ops/s2d.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # tests flip this to exercise the kernel off-TPU


def _kernel(x_ref, w_ref, b_ref, out_ref, acc, *, k, hb):
    width = out_ref.shape[2]
    c = x_ref.shape[3]
    co = out_ref.shape[3]
    m = hb * width
    row0 = pl.program_id(1) * hb

    w = w_ref[...]
    # ONE dynamic row-slice per program (Mosaic miscompiles per-tap dynamic
    # slices); the 25 tap patches are then static offsets into the value
    rows = x_ref[0, pl.ds(row0, hb + k - 1), :, :]

    for u in range(k):
        for v in range(k):
            patch = rows[u:u + hb, v:v + width, :].reshape(m, c)
            part = jax.lax.dot_general(
                patch, w[u, v],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if u == 0 and v == 0:
                acc[...] = part
            else:
                acc[...] += part

    # epilogue in f32 (bf16 exp crashes the Mosaic compiler); one rounding
    # to the output dtype at the end, matching the XLA conv+bias+elu chain's
    # value to within an ulp.  Mosaic has no expm1; for y < 0, exp(y) <= 1
    # so exp(y)-1 has no cancellation blow-up on that branch.
    y = acc[...] + b_ref[0].astype(jnp.float32)
    y = jnp.where(y > 0, y, jnp.exp(y) - 1.0)
    out_ref[...] = y.astype(out_ref.dtype).reshape(1, hb, width, co)


@jax.jit
def _conv_elu_pallas(x, w, b):
    batch, h, width, c = x.shape
    k = w.shape[0]
    co = w.shape[3]
    p = (k - 1) // 2

    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))

    # Row blocks keep the accumulator and output blocks small (the full-H
    # variant crashes the Mosaic compiler at batch 128); the haloed input
    # block is the whole padded image, fetched once per batch element (its
    # index map ignores the row coordinate).
    hb = next(cand for cand in (8, 4, 2, 1) if h % cand == 0)

    return pl.pallas_call(
        functools.partial(_kernel, k=k, hb=hb),
        grid=(batch, h // hb),
        in_specs=[
            pl.BlockSpec((1, h + 2 * p, width + 2 * p, c),
                         lambda b_, h_: (b_, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k, c, co), lambda b_, h_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda b_, h_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hb, width, co),
                               lambda b_, h_: (b_, h_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, h, width, co), x.dtype),
        scratch_shapes=[pltpu.VMEM((hb * width, co), jnp.float32)],
        interpret=_INTERPRET,
    )(xp, w, b.reshape(1, co))


def conv_elu(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 SAME zero-pad conv + bias + ELU.

    Pallas on TPU; identical-math lax fallback elsewhere (the fallback is
    also the reference the kernel is pinned against in tests/test_ops.py).
    """
    if jax.default_backend() != "tpu" and not _INTERPRET:
        p = (w.shape[0] - 1) // 2
        y = lax.conv_general_dilated(
            x, w, (1, 1), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype) + b
        return jax.nn.elu(y)
    return _conv_elu_pallas(x, w, b)


def _gated_kernel(*refs, k, hb, n):
    x_refs = refs[:n]
    w_ref, g_ref, b_ref, out_ref = refs[n:n + 4]
    xbufs = refs[n + 4:n + 4 + n]
    acc, sem = refs[n + 4 + n:]
    width = out_ref.shape[2]
    c = xbufs[0].shape[2]
    co = out_ref.shape[3]
    m = hb * width
    row0 = pl.program_id(1) * hb

    # manual halo DMA: inputs stay in HBM and only (hb + k - 1) rows per
    # input are staged (full-image VMEM blocks OOM with 3-4 gated inputs);
    # one 3-D scratch per input (slicing a 4-D scratch trips Mosaic's
    # sublane-alignment rule on the unaligned padded width)
    def dma(i):
        return pltpu.make_async_copy(
            x_refs[i].at[pl.program_id(0), pl.ds(row0, hb + k - 1)],
            xbufs[i], sem.at[i],
        )

    for i in range(n):
        dma(i).start()

    w = w_ref[...]
    dt = xbufs[0].dtype

    dma(0).wait()
    rows = g_ref[0, 0].astype(dt) * xbufs[0][...]
    for i in range(1, n):
        dma(i).wait()
        rows += g_ref[0, i].astype(dt) * xbufs[i][...]

    for u in range(k):
        for v in range(k):
            patch = rows[u:u + hb, v:v + width, :].reshape(m, c)
            part = jax.lax.dot_general(
                patch, w[u, v],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if u == 0 and v == 0:
                acc[...] = part
            else:
                acc[...] += part

    y = acc[...] + b_ref[0].astype(jnp.float32)
    y = jnp.where(y > 0, y, jnp.exp(y) - 1.0)
    out_ref[...] = y.astype(out_ref.dtype).reshape(1, hb, width, co)


@functools.partial(jax.jit, static_argnames=("n", "width"))
def _gated_conv_elu_pallas(xs, gates, w, b, n, width):
    batch, hp, wp, c = xs[0].shape
    k = w.shape[0]
    co = w.shape[3]
    p = (k - 1) // 2
    h = hp - 2 * p

    hb = next(cand for cand in (8, 4, 2, 1) if h % cand == 0)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY) for _ in range(n)
    ] + [
        pl.BlockSpec((k, k, c, co), lambda b_, h_: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), lambda b_, h_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, co), lambda b_, h_: (0, 0), memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        functools.partial(_gated_kernel, k=k, hb=hb, n=n),
        grid=(batch, h // hb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hb, width, co),
                               lambda b_, h_: (b_, h_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, h, width, co), xs[0].dtype),
        scratch_shapes=[
            *[pltpu.VMEM((hb + k - 1, wp, c), xs[0].dtype) for _ in range(n)],
            pltpu.VMEM((hb * width, co), jnp.float32),
            pltpu.SemaphoreType.DMA((n,)),
        ],
        interpret=_INTERPRET,
    )(*xs, w, gates.reshape(1, n).astype(jnp.float32), b.reshape(1, co))


def gated_conv_elu(xs, gates, w, b, width=None):
    """ELU(conv(sum_i gates[i] * xs[i], w) + b) with PRE-PADDED inputs.

    ``xs``: sequence of (B, H+2p, Wp, C) zero-padded tensors (the SAME
    padded node outputs are shared by every consumer in the stage DAG).
    ``Wp`` may exceed W+2p: Mosaic requires the sublane (W) extent of a
    DMA-sliced array to be 8-aligned, so callers right-pad to a multiple
    of 8 and pass the logical output ``width`` (default assumes Wp=W+2p).
    ``gates``: (n,) sigmoid gate scalars (reference encoder.py:115-123).
    The gated sum happens in VMEM inside the conv kernel — no HBM round
    trip for the combined input.  Identical-math lax fallback off-TPU.
    """
    n = len(xs)
    k = w.shape[0]
    p = (k - 1) // 2
    if width is None:
        width = xs[0].shape[2] - 2 * p
    if jax.default_backend() != "tpu" and not _INTERPRET:
        g = gates.astype(xs[0].dtype)
        h = g[0] * xs[0]
        for i in range(1, n):
            h = h + g[i] * xs[i]
        y = lax.conv_general_dilated(
            h[:, :, :width + 2 * p], w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(xs[0].dtype) + b
        return jax.nn.elu(y)
    return _gated_conv_elu_pallas(tuple(xs), gates, w, b, n, width)
