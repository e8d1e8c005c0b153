"""Pallas TPU kernels: fused decoder-stage glue (upsample + SE + concat).

Why this exists: the serving pass is HBM-bound (81.5 GB/pass unfused =
99.5 ms floor at the v5e's ~819 GB/s; measured 134.6 ms at batch 128), and
more than half of that sits in decoder stages 2-4 where every elementwise
step between the convs round-trips a full/half-resolution tensor: the
align-corners 2x skip upsample (a dense interp-matrix dot, 10 ms at stage
4), the SE excitation multiply, the ELUs, the pixel-shuffle and the concat.
XLA cannot fuse across its conv/dot library calls, so each is a separate
read+write of a 0.5-1.5 GB tensor.

These kernels collapse the whole inter-conv chain of one decoder stage
(reference model/layers/decoder.py:210-249: upsample path, SE-gated skip
path, disparity upsample, concat) into two passes over the data:

  se_squeeze:   mean over pixels of  elu(se_fm + up2(skip_h) + b)
                (the SE global-average-pool input, computed on the fly —
                the full-res `se` tensor is never materialised)
  assemble:     the stage's concat tensor [pixel_shuffle(elu(xc)),
                elu(se) * gates, up2(disp)] written directly, with the
                three 2x align-corners upsamples computed as in-VMEM
                parity lerps (exact _lerp_coeffs weights, ops/resize.py)

Layout is the whole trick: XLA stores every conv activation in this
program batch-minor ({0,3,2,1}: physical (H, W, C, B), batch in the
128-wide lane dimension — docs/PERFORMANCE.md "layout").  A logical
transpose to (H, W, C, B) is therefore a FREE bitcast, and the kernels
operate natively on that view: lanes = batch (packed at batch 128),
sublanes = channels, W-shifts for the lerps are plain address offsets.
The earlier s2d-path Pallas kernels took (B, H, W, C) operands and paid a
real relayout at every pallas_call boundary — that cost is what killed
them end-to-end (PERFORMANCE.md round-3 notes).

Block sizing: the v5e exposes far more VMEM than the conservative 16 MB
rule of thumb (an 82 MB scratch compiles and runs; the physical VMEM is
128 MB), so blocks are sized to tens of MB — fewer, fatter programs whose
DMA halos overlap less — while an inner loop over output row pairs keeps
the f32 ELU temporaries small.

Reference semantics anchored: model/layers/decoder.py:210-249 (DecoderStage
dataflow), decoder.py:111-136 (SELayer), torch F.interpolate
align_corners=True (the exact coefficient math lives in ops/resize.py
_lerp_coeffs and is replicated here: bit-for-bit in f32 mode, and with the
same bf16 weight quantisation as the serving matmul-upsample path in bf16
mode, save the last odd row/column which may differ by ~1 ulp of the f32
coefficient).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # tests flip this to exercise the kernels off-TPU

_VMEM_LIMIT = 100 * 1024 * 1024
_BLOCK_BUDGET = 44 * 1024 * 1024


def _use_kernel() -> bool:
    return jax.default_backend() == "tpu" or _INTERPRET


# ---------------------------------------------------------------------------
# shared in-kernel helpers
# ---------------------------------------------------------------------------


def _elu(se):
    """ELU with the exp in f32 (bf16 exp crashes the Mosaic compiler)."""
    y = se.astype(jnp.float32)
    return jnp.where(y > 0, y, jnp.exp(y) - 1.0)


def _row_weights(i, rh, scale, dt):
    """(rh, 1, 1, 1) lerp fractions for the even/odd output rows built from
    half-res rows [i*rh, i*rh+rh): even rows lerp x[r-1]->x[r] with
    frac = scale*2r - (r-1) (a zero-padded x[-1] is weightless because
    frac(0) == 1 exactly), odd rows lerp x[r]->x[r+1] with
    frac = scale*(2r+1) - r.  Same f32 ops as ops/resize.py _lerp_coeffs,
    so the fractions match bit-for-bit; ``dt`` quantises them exactly like
    the serving matmul-upsample path quantises its interp matrix."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rh, 1, 1, 1), 0) + i * rh
    fr = r.astype(jnp.float32)
    fe = scale * (2.0 * fr) - (fr - 1.0)
    fo = scale * (2.0 * fr + 1.0) - fr
    return fe.astype(dt), fo.astype(dt)


def _col_weights(c0, n, scale, dt):
    """(1, n, 1, 1) fraction vectors for even/odd output columns built from
    half-res columns [c0, c0+n)."""
    m = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1, 1), 1) + c0
    fm = m.astype(jnp.float32)
    few = scale * (2.0 * fm) - (fm - 1.0)
    fow = scale * (2.0 * fm + 1.0) - fm
    return few.astype(dt), fow.astype(dt)


def _up2_block(buf, fe, fo, few, fow, rh, n):
    """2x align_corners upsample of a zero-padded half-res VMEM block.

    ``buf``: (rh+2, n+2, C, B) — half rows [r0-1, r0+rh+1), cols
    [c0-1, c0+n+1).  Returns (2rh, 2n, C, B) with rows/cols interleaved by
    parity (stack+reshape over leading dims — vector addressing, not a
    relayout).
    """
    c, b = buf.shape[2], buf.shape[3]
    prev, cur, nxt = buf[0:rh], buf[1:rh + 1], buf[2:rh + 2]
    er = prev + fe * (cur - prev)           # even output rows
    orow = cur + fo * (nxt - cur)           # odd output rows
    rows = jnp.stack([er, orow], axis=1).reshape(2 * rh, n + 2, c, b)
    pc, cc, nc = rows[:, 0:n], rows[:, 1:n + 1], rows[:, 2:n + 2]
    ec = pc + few * (cc - pc)
    oc = cc + fow * (nc - cc)
    return jnp.stack([ec, oc], axis=2).reshape(2 * rh, 2 * n, c, b)


def _fm_fold(fm_rows, kfm_ref, cso):
    """In-kernel SE 1x1 conv over a tiny channel count: (2, wb, cf, B)
    feature-map rows -> (2, wb, cso, B) f32.  cf is small (the decoder's
    full-res stage sees the 3-channel input image, reference
    model/decoder.py:49-57), so the contraction is cf broadcast-FMAs on the
    VPU and the full-res ``se_fm`` tensor never exists in HBM
    (docs/PERFORMANCE.md round-4 budget, finding 4)."""
    f = fm_rows.astype(jnp.float32)
    acc = f[:, :, 0:1, :] * kfm_ref[0].reshape(1, 1, cso, 1)
    for ci in range(1, fm_rows.shape[2]):
        acc = acc + f[:, :, ci:ci + 1, :] * kfm_ref[ci].reshape(1, 1, cso, 1)
    return acc


def _to_hwcb(x):
    """(B, H, W, C) -> (H, W, C, B).  XLA stores these activations
    batch-minor ({0,3,2,1}), so this transpose is a layout bitcast."""
    return jnp.transpose(x, (1, 2, 3, 0))


def _from_hwcb(x):
    return jnp.transpose(x, (3, 0, 1, 2))


def _pad_half(x):
    """Zero-pad H2/W2 by 1 on each side (the lerp edge taps; their weights
    are exactly 0 or 1 so the pad value never contributes)."""
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))


def _pick_blocks(h2, w, per_cell_bytes, budget=_BLOCK_BUDGET):
    """(rh half-rows, wb full-cols) block: wide-first (full W when it fits —
    wide blocks keep the vector ops long and the DMA halo overlap lives on
    the cheap row axis), growing rows within the budget.  Overridable for
    sweeps via UMT_FUSED_BLOCKS="rh,wb"."""
    import os
    override = os.environ.get("UMT_FUSED_BLOCKS")
    if override:
        rh, wb = (int(v) for v in override.split(","))
        return rh, wb
    wb = w
    # the w-divisibility guard mirrors the rows loop below: an indivisible
    # wb would make grid=(.., w // wb) silently skip trailing columns
    while (wb > 16 and wb * per_cell_bytes > budget
           and w % (wb // 2) == 0):
        wb //= 2
    rh = 1
    while (rh * 2 <= 8 and h2 % (rh * 2) == 0
           and rh * 2 * wb * per_cell_bytes <= budget):
        rh *= 2
    return rh, wb


# ---------------------------------------------------------------------------
# kernel: assemble the stage concat tensor AND the SE sums in one pass
# ---------------------------------------------------------------------------
#
# The natural two-kernel split (squeeze first — gates are a global mean —
# then a gated assemble) computes the lerp+ELU chain TWICE; measured, the
# squeeze pass alone cost 7.2 ms at stage-4 shapes.  Instead one kernel
# writes the concat tensor with the skip half UNGATED (channel order
# [z | xup | disp] — a free build-time permutation of the iconv kernel's
# input channels) and accumulates the SE sums as a second output; a cheap
# aliased kernel then scales the z channel block in place once the gates
# (mean -> SE MLP, a few tiny XLA matmuls) are known.


def _assemble_z_kernel(se_ref, kfm_ref, xc_ref, b_ref, skip_any, disp_any,
                       out_ref, sum_ref, sbuf, dbuf, sem, *, rh, wbc,
                       sh, sw, cu, cso, cd, cf):
    i = pl.program_id(0)
    wb_ = pl.program_id(1)
    c0 = wb_ * wbc

    cp_s = pltpu.make_async_copy(
        skip_any.at[pl.ds(i * rh, rh + 2), pl.ds(c0, wbc + 2)],
        sbuf, sem.at[0])
    cp_s.start()
    if cd:
        cp_d = pltpu.make_async_copy(
            disp_any.at[pl.ds(i * rh, rh + 2), pl.ds(c0, wbc + 2)],
            dbuf, sem.at[1])
        cp_d.start()

    @pl.when((i == 0) & (wb_ == 0))
    def _():
        sum_ref[...] = jnp.zeros(sum_ref.shape, sum_ref.dtype)

    dt = out_ref.dtype
    fe, fo = _row_weights(i, rh, sh, dt)
    few, fow = _col_weights(c0, wbc, sw, dt)
    bias = b_ref[...].astype(dt)
    b = out_ref.shape[3]

    # upsample path: pixel shuffle of elu(xc), channels phase-major
    for r in range(rh):
        planes = [_elu(xc_ref[r, :, p * cu:(p + 1) * cu, :]).astype(dt)
                  for p in range(4)]
        rows = [jnp.stack([planes[2 * a], planes[2 * a + 1]],
                          axis=1).reshape(2 * wbc, cu, b) for a in (0, 1)]
        out_ref[2 * r:2 * r + 2, :, cso:cso + cu, :] = jnp.stack(rows, axis=0)

    cp_s.wait()
    acc = jnp.zeros(sum_ref.shape, sum_ref.dtype)
    for r in range(rh):
        up = _up2_block(sbuf[r:r + 3], fe[r:r + 1], fo[r:r + 1],
                        few, fow, 1, wbc)
        if cf:
            se = (_fm_fold(se_ref[2 * r:2 * r + 2], kfm_ref, cso)
                  + up.astype(jnp.float32) + b_ref[...])
        else:
            se = se_ref[2 * r:2 * r + 2] + up + bias
        z = _elu(se)
        acc = acc + z.sum(axis=(0, 1))
        out_ref[2 * r:2 * r + 2, :, 0:cso, :] = z.astype(dt)
    sum_ref[...] += acc

    if cd:
        cp_d.wait()
        for r in range(rh):
            up = _up2_block(dbuf[r:r + 3], fe[r:r + 1], fo[r:r + 1],
                            few, fow, 1, wbc)
            out_ref[2 * r:2 * r + 2, :, cso + cu:cso + cu + cd, :] = up


@jax.jit
def _assemble_z_pallas(se_fm, skip_h, xc, disp_h, bias, kfm):
    b, h, w = se_fm.shape[:3]
    cso = skip_h.shape[3]
    cf = se_fm.shape[3] if kfm is not None else 0
    h2, w2 = skip_h.shape[1], skip_h.shape[2]
    cu = xc.shape[3] // 4
    cd = disp_h.shape[3] if disp_h is not None else 0
    ccat = cu + cso + cd

    se_t = _to_hwcb(se_fm)
    kfm_in = (kfm.astype(jnp.float32)[:, :, None] if kfm is not None
              else jnp.zeros((1, cso, 1), jnp.float32))
    skip_t = _to_hwcb(_pad_half(skip_h))
    xc_t = _to_hwcb(xc)
    disp_t = (_to_hwcb(_pad_half(disp_h)) if disp_h is not None
              else jnp.zeros((1, 1, 1, b), se_fm.dtype))

    sh = np.float32(h2 - 1) / np.float32(h - 1)
    sw = np.float32(w2 - 1) / np.float32(w - 1)

    it = se_fm.dtype.itemsize
    per_cell = (
        2 * (2 * ccat * b * it + 2 * cso * b * it + 2 * cu * b * it)
        + ((cso + cd) * b * it) * 3 // 2
        + cso * b * 2
    )
    rh, wb = _pick_blocks(h2, w, per_cell)
    wbc = wb // 2

    cat_t, sums = pl.pallas_call(
        functools.partial(_assemble_z_kernel, rh=rh, wbc=wbc, sh=sh, sw=sw,
                          cu=cu, cso=cso, cd=cd, cf=cf),
        grid=(h2 // rh, w // wb),
        in_specs=[
            pl.BlockSpec((2 * rh, wb, cf or cso, b), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(kfm_in.shape, lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rh, wbc, 4 * cu, b), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cso, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((2 * rh, wb, ccat, b), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cso, b), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, w, ccat, b), se_fm.dtype),
            jax.ShapeDtypeStruct((cso, b), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rh + 2, wbc + 2, cso, b), se_fm.dtype),
            pltpu.VMEM((rh + 2, wbc + 2, max(cd, 1), b), se_fm.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_INTERPRET,
    )(se_t, kfm_in, xc_t, bias.reshape(cso, 1).astype(jnp.float32),
      skip_t, disp_t)
    return _from_hwcb(cat_t), sums.T / jnp.float32(h * w)


def _fold_fallback(fm, k_fm, dtype):
    """Fallback for the in-kernel fm fold: a plain f32 1x1 matmul."""
    return jnp.einsum("bhwc,co->bhwo", fm.astype(jnp.float32),
                      k_fm.astype(jnp.float32)).astype(dtype)


def assemble_z(se_fm, skip_h, xc, disp_h, bias, k_fm=None):
    """One fused pass producing the decoder stage's concat tensor with the
    skip half UNGATED, plus the SE squeeze:

        cat  = concat([elu(se_fm + up2(skip_h) + bias),    # z, ungated
                       pixel_shuffle(elu(xc)),             # phase-major xc
                       up2(disp_h)], channels)
        mean = mean over pixels of z  (B, Cso) f32

    Apply ``gate_z(cat, gates, cso)`` once the SE MLP has turned ``mean``
    into gates.  ``disp_h`` may be None (concat_disp=False stages).

    With ``k_fm`` (cf, Cso), the first operand is the RAW stage feature map
    (B, H, W, cf) and ``se_fm = fm @ k_fm`` is computed in-kernel (f32) —
    for the decoder's full-res stage, whose feature map is the 3-channel
    input image, this keeps the 1 GB ``se_fm`` tensor out of HBM entirely.
    """
    if not _use_kernel():
        from ..resize import resize_bilinear
        if k_fm is not None:
            se_fm = _fold_fallback(se_fm, k_fm, jnp.float32)
        h, w = se_fm.shape[1], se_fm.shape[2]
        se = se_fm + resize_bilinear(skip_h, (h, w)).astype(se_fm.dtype) + bias
        z = jax.nn.elu(se).astype(skip_h.dtype)
        parts = [z, _shuffle_phase_major(jax.nn.elu(xc))]
        if disp_h is not None:
            parts.append(resize_bilinear(disp_h, (h, w)))
        return (jnp.concatenate(parts, axis=-1),
                jnp.mean(z, axis=(1, 2), dtype=jnp.float32))
    return _assemble_z_pallas(se_fm, skip_h, xc, disp_h, bias, k_fm)


def _gate_kernel(g_ref, cat_ref, out_ref):
    out_ref[...] = cat_ref[...] * g_ref[...].astype(cat_ref.dtype)


@functools.partial(jax.jit, static_argnames=("cso",))
def _gate_z_pallas(cat, gates, cso):
    b, h, w, ccat = cat.shape
    cat_t = _to_hwcb(cat)
    # blocks only cover the z channel range [0, cso); keep them ~4 MB so
    # the double-buffered in+out windows stay far below VMEM (an 8-row x
    # full-width block at stage-2 shapes was 32 MB x 2 levels x in+out =
    # OOM at 128 MB physical VMEM)
    cell = cso * b * cat.dtype.itemsize
    wb = w
    while (wb > 16 and wb * cell > 4 * 1024 * 1024
           and w % (wb // 2) == 0):
        wb //= 2
    rows = 1
    while (rows * 2 <= 8 and h % (rows * 2) == 0
           and rows * 2 * wb * cell <= 4 * 1024 * 1024):
        rows *= 2
    out = pl.pallas_call(
        _gate_kernel,
        grid=(h // rows, w // wb),
        in_specs=[
            pl.BlockSpec((cso, b), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, wb, cso, b), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, wb, cso, b), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, ccat, b), cat.dtype),
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_INTERPRET,
    )(gates.T, cat_t)
    return _from_hwcb(out)


def gate_z(cat, gates, cso):
    """Scale ``cat[..., :cso]`` by per-(batch, channel) SE gates, in place
    (the cat buffer is donated; only the z channel block is touched —
    blocks cover channels [0, cso) and the aliased remainder is preserved,
    which tests/test_decoder_fused.py pins on every backend)."""
    if not _use_kernel():
        g = gates[:, None, None, :].astype(cat.dtype)
        return jnp.concatenate([cat[..., :cso] * g, cat[..., cso:]], axis=-1)
    return _gate_z_pallas(cat, gates, cso)


# ---------------------------------------------------------------------------
# kernel A: SE squeeze (global mean of elu(se) without materialising se)
# ---------------------------------------------------------------------------


def _squeeze_kernel(se_ref, kfm_ref, b_ref, skip_any, out_ref, sbuf, sem, *,
                    rh, wbc, sh, sw, cf):
    i = pl.program_id(0)
    wa = pl.program_id(1)
    c0 = wa * wbc

    cp = pltpu.make_async_copy(
        skip_any.at[pl.ds(i * rh, rh + 2), pl.ds(c0, wbc + 2)], sbuf, sem)
    cp.start()

    @pl.when((i == 0) & (wa == 0))
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    dt = se_ref.dtype
    fe, fo = _row_weights(i, rh, sh, dt)
    few, fow = _col_weights(c0, wbc, sw, dt)
    bias = b_ref[...].astype(dt)  # (C, 1) broadcasts over lanes

    cp.wait()
    acc = jnp.zeros(out_ref.shape, out_ref.dtype)
    cso = out_ref.shape[0]
    # row pairs, one at a time: bounds the f32 ELU temporaries while the
    # DMA/block granularity stays large
    for r in range(rh):
        up = _up2_block(sbuf[r:r + 3], fe[r:r + 1], fo[r:r + 1],
                        few, fow, 1, wbc)
        if cf:
            se = (_fm_fold(se_ref[2 * r:2 * r + 2], kfm_ref, cso)
                  + up.astype(jnp.float32) + b_ref[...])
        else:
            se = se_ref[2 * r:2 * r + 2] + up + bias
        acc = acc + _elu(se).sum(axis=(0, 1))
    out_ref[...] += acc


@jax.jit
def _se_squeeze_pallas(se_fm, skip_h, bias, kfm):
    b, h, w = se_fm.shape[:3]
    c = skip_h.shape[3]
    cf = se_fm.shape[3] if kfm is not None else 0
    h2, w2 = skip_h.shape[1], skip_h.shape[2]

    se_t = _to_hwcb(se_fm)
    skip_t = _to_hwcb(_pad_half(skip_h))
    kfm_in = (kfm.astype(jnp.float32)[:, :, None] if kfm is not None
              else jnp.zeros((1, c, 1), jnp.float32))

    # host-side f32 scale constants, same rounding as _lerp_coeffs
    sh = np.float32(h2 - 1) / np.float32(h - 1)
    sw = np.float32(w2 - 1) / np.float32(w - 1)

    it = se_fm.dtype.itemsize
    # per (half-row x full-col) cell: se block (2 rows) x2 buffers, skip
    # scratch, f32 elu temp for one row pair (amortised: 2*4*c/(rh*wb) — use
    # the 2-row bound)
    per_cell = 2 * (2 * c * b * it) + (c * b * it) * 3 // 2 + c * b * 2
    rh, wb = _pick_blocks(h2, w, per_cell)
    wbc = wb // 2

    sums = pl.pallas_call(
        functools.partial(_squeeze_kernel, rh=rh, wbc=wbc, sh=sh, sw=sw,
                          cf=cf),
        grid=(h2 // rh, w // wb),
        in_specs=[
            pl.BlockSpec((2 * rh, wb, cf or c, b), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(kfm_in.shape, lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((c, b), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, b), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rh + 2, wbc + 2, c, b), se_fm.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_INTERPRET,
    )(se_t, kfm_in, bias.reshape(c, 1).astype(jnp.float32), skip_t)
    return sums.T / jnp.float32(h * w)


def se_squeeze(se_fm, skip_h, bias, k_fm=None):
    """(B, C) f32 mean over pixels of ``elu(se_fm + up2(skip_h) + bias)``.

    ``se_fm``: (B, H, W, C) — the feature-map half of the SE conv output;
    ``skip_h``: (B, H/2, W/2, C) — the skip half, pre-upsample.  The full-res
    ``se`` tensor is never written to HBM.  With ``k_fm`` (cf, C) the first
    operand is the raw stage feature map and the SE conv's feature-map half
    is folded in-kernel (see ``assemble_z``) — the squeeze then reads only
    cf + C/4 channels' worth of HBM, which is what makes the squeeze-first
    pipeline cheaper than a ``gate_z`` rewrite pass.
    """
    if not _use_kernel():
        from ..resize import resize_bilinear
        if k_fm is not None:
            se_fm = _fold_fallback(se_fm, k_fm, jnp.float32)
        h, w = se_fm.shape[1], se_fm.shape[2]
        se = se_fm + resize_bilinear(skip_h, (h, w)).astype(se_fm.dtype) + bias
        return jnp.mean(jax.nn.elu(se), axis=(1, 2), dtype=jnp.float32)
    return _se_squeeze_pallas(se_fm, skip_h, bias, k_fm)


# ---------------------------------------------------------------------------
# kernel B: assemble the stage concat tensor in one pass
# ---------------------------------------------------------------------------


def _assemble_kernel(se_ref, kfm_ref, xc_ref, g_ref, b_ref, skip_any,
                     disp_any, out_ref, sbuf, dbuf, sem, *, rh, wbc, sh, sw,
                     cu, cso, cd, cf):
    i = pl.program_id(0)
    wb_ = pl.program_id(1)
    c0 = wb_ * wbc

    cp_s = pltpu.make_async_copy(
        skip_any.at[pl.ds(i * rh, rh + 2), pl.ds(c0, wbc + 2)],
        sbuf, sem.at[0])
    cp_s.start()
    if cd:
        cp_d = pltpu.make_async_copy(
            disp_any.at[pl.ds(i * rh, rh + 2), pl.ds(c0, wbc + 2)],
            dbuf, sem.at[1])
        cp_d.start()

    dt = out_ref.dtype
    fe, fo = _row_weights(i, rh, sh, dt)
    few, fow = _col_weights(c0, wbc, sw, dt)
    bias = b_ref[...].astype(dt)
    g = g_ref[...].astype(dt)

    # upsample path: pixel shuffle of elu(xc).  xc's output channels were
    # permuted phase-major at build time, so each (row-parity, col-parity)
    # plane is a contiguous channel slice — the shuffle is two slices and a
    # column interleave, no gather.  Channel order matches assemble_z
    # ([z | xup | disp]) so the two pipelines share one build-time iconv
    # input permutation.
    b = out_ref.shape[3]
    for r in range(rh):
        planes = [_elu(xc_ref[r, :, p * cu:(p + 1) * cu, :]).astype(dt)
                  for p in range(4)]
        rows = [jnp.stack([planes[2 * a], planes[2 * a + 1]],
                          axis=1).reshape(2 * wbc, cu, b) for a in (0, 1)]
        out_ref[2 * r:2 * r + 2, :, cso:cso + cu, :] = jnp.stack(rows, axis=0)

    cp_s.wait()
    for r in range(rh):
        up = _up2_block(sbuf[r:r + 3], fe[r:r + 1], fo[r:r + 1],
                        few, fow, 1, wbc)
        if cf:
            se = (_fm_fold(se_ref[2 * r:2 * r + 2], kfm_ref, cso)
                  + up.astype(jnp.float32) + b_ref[...])
        else:
            se = se_ref[2 * r:2 * r + 2, :, 0:cso, :] + up + bias
        z = _elu(se).astype(dt)
        out_ref[2 * r:2 * r + 2, :, 0:cso, :] = z * g

    if cd:
        cp_d.wait()
        for r in range(rh):
            up = _up2_block(dbuf[r:r + 3], fe[r:r + 1], fo[r:r + 1],
                            few, fow, 1, wbc)
            out_ref[2 * r:2 * r + 2, :, cso + cu:cso + cu + cd, :] = up


@jax.jit
def _assemble_pallas(se_fm, skip_h, gates, xc, disp_h, bias, kfm):
    b, h, w = se_fm.shape[:3]
    cso = skip_h.shape[3]
    cf = se_fm.shape[3] if kfm is not None else 0
    h2, w2 = skip_h.shape[1], skip_h.shape[2]
    cu = xc.shape[3] // 4
    cd = disp_h.shape[3] if disp_h is not None else 0
    ccat = cu + cso + cd

    se_t = _to_hwcb(se_fm)
    kfm_in = (kfm.astype(jnp.float32)[:, :, None] if kfm is not None
              else jnp.zeros((1, cso, 1), jnp.float32))
    skip_t = _to_hwcb(_pad_half(skip_h))
    xc_t = _to_hwcb(xc)
    disp_t = (_to_hwcb(_pad_half(disp_h)) if disp_h is not None
              else jnp.zeros((1, 1, 1, b), se_fm.dtype))

    sh = np.float32(h2 - 1) / np.float32(h - 1)
    sw = np.float32(w2 - 1) / np.float32(w - 1)

    it = se_fm.dtype.itemsize
    per_cell = (
        2 * (2 * ccat * b * it          # out block (double-buffered)
             + 2 * cso * b * it         # se block
             + 2 * cu * b * it)         # xc block (4cu at half cols)
        + ((cso + cd) * b * it) * 3 // 2  # DMA scratch
        + cso * b * 2                     # f32 row-pair temporaries
    )
    rh, wb = _pick_blocks(h2, w, per_cell)
    wbc = wb // 2

    out = pl.pallas_call(
        functools.partial(_assemble_kernel, rh=rh, wbc=wbc, sh=sh, sw=sw,
                          cu=cu, cso=cso, cd=cd, cf=cf),
        grid=(h2 // rh, w // wb),
        in_specs=[
            pl.BlockSpec((2 * rh, wb, cf or cso, b), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(kfm_in.shape, lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rh, wbc, 4 * cu, b), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cso, b), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cso, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((2 * rh, wb, ccat, b),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, ccat, b), se_fm.dtype),
        scratch_shapes=[
            pltpu.VMEM((rh + 2, wbc + 2, cso, b), se_fm.dtype),
            pltpu.VMEM((rh + 2, wbc + 2, max(cd, 1), b), se_fm.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_INTERPRET,
    )(se_t, kfm_in, xc_t, gates.T.astype(skip_h.dtype),
      bias.reshape(cso, 1).astype(jnp.float32), skip_t, disp_t)
    return _from_hwcb(out)


def _shuffle_phase_major(xc):
    """pixel_shuffle for phase-major channel order (c' = (2a+b)*Cu + c)."""
    b, h2, w2, c4 = xc.shape
    cu = c4 // 4
    x = xc.reshape(b, h2, w2, 2, 2, cu)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h2, 2 * w2, cu)


def assemble(se_fm, skip_h, gates, xc, disp_h, bias, k_fm=None):
    """The decoder stage's concat tensor, fused and GATED (the squeeze-first
    pipeline: ``se_squeeze`` -> SE MLP -> this kernel; no ``gate_z`` pass):

        concat([elu(se_fm + up2(skip_h) + bias) * gates,   # z, gated
                pixel_shuffle(elu(xc)),                    # phase-major xc
                up2(disp_h)], channels)

    Channel order matches ``assemble_z`` ([z | xup | disp]), so both
    pipelines share the build-time iconv input permutation and the
    cat-as-next-skip handle (z sits first).  ``xc`` carries PHASE-MAJOR
    output channels (build-time kernel output permutation, serving.py) so
    the in-kernel shuffle is slice+interleave.  ``disp_h`` may be None
    (decoder stages with concat_disp=False).  ``k_fm``: see ``assemble_z``.
    Returns (B, H, W, Cso+Cu[+4]).
    """
    if not _use_kernel():
        from ..resize import resize_bilinear
        if k_fm is not None:
            se_fm = _fold_fallback(se_fm, k_fm, jnp.float32)
        h, w = se_fm.shape[1], se_fm.shape[2]
        se = se_fm + resize_bilinear(skip_h, (h, w)).astype(se_fm.dtype) + bias
        z = (jax.nn.elu(se).astype(skip_h.dtype)
             * gates[:, None, None, :].astype(skip_h.dtype))
        parts = [z, _shuffle_phase_major(jax.nn.elu(xc))]
        if disp_h is not None:
            parts.append(resize_bilinear(disp_h, (h, w)))
        return jnp.concatenate(parts, axis=-1)
    return _assemble_pallas(se_fm, skip_h, gates, xc, disp_h, bias, k_fm)
