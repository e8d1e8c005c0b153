"""Pallas TPU kernel: exact 2x align_corners bilinear upsample (NHWC).

The decoder's skip/disp 2x upsamples are serving hot spots: XLA's best
formulation (dense interp-matrix matmul) runs ~10x off roofline at the hot
(128,128,256,32) site (14 ms for a 1.07 GB output; elementwise/select
variants are 2x worse — docs/PERFORMANCE.md).  The two kernels here stay
within Mosaic-friendly constructs:

* **Column kernel** — operates C-in-lanes; the W-axis taps are monotone per
  output parity (even = lerp(x[j-1], x[j]), odd = lerp(x[j], x[j+1]) — see
  ops/resize.py `_upsample2_axis`), so each parity is one sublane shift +
  lerp, and the W-interleave is `pltpu.repeat` + parity select along
  sublanes.
* **Row kernel** — operates flat (H, W*C) with full 128-lanes; each block of
  8 output rows is one (8, 6) @ (6, W*C) banded matmul whose band matrix is
  precomputed on the host per block-row (align_corners weights are
  position-dependent, but each block's 8 output rows draw from at most 6
  consecutive source rows) — the H-interleave is absorbed into the band.

Both phases use the exact `_lerp_coeffs` weights, so values match the
resize.py gather-lerp formulation to f32 rounding.  Reference semantics:
``F.interpolate(..., scale_factor=2, align_corners=True)``
(reference model/layers/decoder.py:230-240).

STATUS — measured negative result (kept for the record + future work): at
(128,128,256,32) this kernel runs 30.7 ms vs the XLA interp-matrix matmul's
13.9 ms — the C-in-lanes column phase pays 4x lane padding, f32 widening,
and an in-VMEM sublane relayout for the interleave, which together exceed
the XLA path's transpose overhead.  The serving path therefore keeps
resize_bilinear (ops/resize.py); revisit with a flat-lane column phase if
the upsample returns to the profile's top.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..resize import _lerp_coeffs, resize_bilinear

_INTERPRET = False

_ROWS_PER_BLOCK = 8
# 8 output rows draw from <= 6 consecutive source rows; the window is
# widened to 16 and aligned to a multiple of 8 because Mosaic requires
# sublane-aligned dynamic vector loads
_BAND = 16


@functools.lru_cache(maxsize=None)
def _row_bands(h: int):
    """Per block-row: (start source row, (8, 6) weight band) as np arrays."""
    lo, hi, frac = _lerp_coeffs(2 * h, h)
    starts, bands = [], []
    for r0 in range(0, 2 * h, _ROWS_PER_BLOCK):
        rows = range(r0, r0 + _ROWS_PER_BLOCK)
        start = min(min(lo[r], hi[r]) for r in rows)
        start = (start // 8) * 8  # sublane alignment
        start = min(start, h - _BAND) if h >= _BAND else 0
        band = np.zeros((_ROWS_PER_BLOCK, _BAND), np.float32)
        for i, r in enumerate(rows):
            band[i, lo[r] - start] += 1.0 - frac[r]
            band[i, hi[r] - start] += frac[r]
        starts.append(start)
        bands.append(band)
    return (np.asarray(starts, np.int32),
            np.stack(bands))  # (nblocks,), (nblocks, 8, 6)


def _col_kernel(x_ref, we_ref, wo_ref, o_ref, *, w):
    w_even = we_ref[...].reshape(1, w, 1)
    w_odd = wo_ref[...].reshape(1, w, 1)

    x = x_ref[0].astype(jnp.float32)  # (Hb, W, C)
    x_prev = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    x_next = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    even = x_prev + w_even * (x - x_prev)
    odd = x + w_odd * (x_next - x)

    # W-interleave: stack the parity planes on a new axis after W and merge
    # (W, 2) -> 2W; C (the lane dim) is untouched, so this is a sublane-dim
    # relayout Mosaic handles without lane gathers
    hb = even.shape[0]
    out = jnp.stack([even, odd], axis=2).reshape(hb, 2 * w, even.shape[2])
    o_ref[...] = out[None].astype(o_ref.dtype)


def _row_kernel(starts_ref, x_ref, bands_ref, o_ref, *, wc):
    i = pl.program_id(1)
    start = pl.multiple_of(starts_ref[i], 8)
    band = bands_ref[i].astype(jnp.float32)  # (8, _BAND)
    rows = x_ref[0, pl.ds(start, _BAND), :].astype(jnp.float32)  # (_BAND, WC)
    out = jax.lax.dot_general(
        band, rows, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # keep f32 operands exact (default TPU matmul precision truncates
        # them to bf16; K=6, so the 3-pass cost is irrelevant)
        precision=jax.lax.Precision.HIGHEST,
    )
    o_ref[...] = out[None].astype(o_ref.dtype)


@jax.jit
def _upsample2x2_pallas(x):
    batch, h, w, c = x.shape

    hb = next(cand for cand in (8, 4, 2, 1) if h % cand == 0)
    _, _, frac = _lerp_coeffs(2 * w, w)
    y1 = pl.pallas_call(
        functools.partial(_col_kernel, w=w),
        grid=(batch, h // hb),
        in_specs=[pl.BlockSpec((1, hb, w, c), lambda b_, h_: (b_, h_, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, w), lambda b_, h_: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, w), lambda b_, h_: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, hb, 2 * w, c),
                               lambda b_, h_: (b_, h_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, h, 2 * w, c), x.dtype),
        interpret=_INTERPRET,
    )(x, jnp.asarray(frac[0::2].reshape(1, w)),
      jnp.asarray(frac[1::2].reshape(1, w)))

    starts, bands = _row_bands(h)
    wc = 2 * w * c
    y1f = y1.reshape(batch, h, wc)
    nblocks = 2 * h // _ROWS_PER_BLOCK
    out = pl.pallas_call(
        functools.partial(_row_kernel, wc=wc),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(batch, nblocks),
            in_specs=[
                pl.BlockSpec((1, h, wc), lambda b_, i_, starts: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nblocks, _ROWS_PER_BLOCK, _BAND),
                             lambda b_, i_, starts: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, _ROWS_PER_BLOCK, wc),
                lambda b_, i_, starts: (b_, i_, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((batch, 2 * h, wc), x.dtype),
        interpret=_INTERPRET,
    )(jnp.asarray(starts), y1f, jnp.asarray(bands))
    return out.reshape(batch, 2 * h, 2 * w, c)


def upsample2x2(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x align_corners bilinear upsample of NHWC ``x``.

    Pallas on TPU (H divisible by 2, 2H divisible by 8); identical-math
    resize_bilinear fallback elsewhere.
    """
    batch, h, w, c = x.shape
    if ((jax.default_backend() != "tpu" and not _INTERPRET)
            or h < _BAND or (2 * h) % _ROWS_PER_BLOCK or w < 2):
        return resize_bilinear(x, (2 * h, 2 * w))
    return _upsample2x2_pallas(x)
