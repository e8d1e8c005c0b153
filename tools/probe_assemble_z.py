#!/usr/bin/env python3
"""Bisect the assemble_z kernel's 3.1x-off-floor gap (round-4 budget
finding 3: 12.0 ms vs 3.8 ms bytes at dec4) by timing ablated kernel
variants at the production stage shapes: full kernel, ELU dropped, SE-sum
accumulation dropped, xup path dropped, disp path dropped, and a
pure-copy skeleton (= the kernel's achievable byte floor).  Each ablation
keeps the same blocks/DMA structure, so the deltas attribute the gap to
compute families rather than to layout guesses.

Chained-K methodology (utils/benchmark.py): data-dependent passes, slope
between two fori_loop lengths, min-of-reps per endpoint.

Usage: python tools/probe_assemble_z.py [stage ...]   (default: 4 3)
Env:   VARIANTS=full,noelu,...  REPS=5  B=128
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import uncertainty_model_tpu.ops.pallas.decoder_fused as df

STAGES = {
    2: (64, 128, 128, 32, 4),
    3: (128, 256, 64, 16, 4),
    4: (256, 512, 32, 8, 4),
}


def _kernel(se_ref, kfm_ref, xc_ref, b_ref, skip_any, disp_any,
            out_ref, sum_ref, sbuf, dbuf, sem, *, rh, wbc, sh, sw,
            cu, cso, cd, cf, elu, sums, xup, dispp, bf16fold=False):
    i = pl.program_id(0)
    wb_ = pl.program_id(1)
    c0 = wb_ * wbc

    cp_s = pltpu.make_async_copy(
        skip_any.at[pl.ds(i * rh, rh + 2), pl.ds(c0, wbc + 2)],
        sbuf, sem.at[0])
    cp_s.start()
    if cd and dispp:
        cp_d = pltpu.make_async_copy(
            disp_any.at[pl.ds(i * rh, rh + 2), pl.ds(c0, wbc + 2)],
            dbuf, sem.at[1])
        cp_d.start()

    @pl.when((i == 0) & (wb_ == 0))
    def _():
        sum_ref[...] = jnp.zeros(sum_ref.shape, sum_ref.dtype)

    dt = out_ref.dtype
    fe, fo = df._row_weights(i, rh, sh, dt)
    few, fow = df._col_weights(c0, wbc, sw, dt)
    bias = b_ref[...].astype(dt)
    b = out_ref.shape[3]

    act = df._elu if elu else (lambda v: v.astype(jnp.float32))

    for r in range(rh):
        if xup:
            planes = [act(xc_ref[r, :, p * cu:(p + 1) * cu, :]).astype(dt)
                      for p in range(4)]
            rows = [jnp.stack([planes[2 * a], planes[2 * a + 1]],
                              axis=1).reshape(2 * wbc, cu, b) for a in (0, 1)]
            out_ref[2 * r:2 * r + 2, :, cso:cso + cu, :] = jnp.stack(
                rows, axis=0)
        else:
            # zeros, not a broadcast of xc_ref[r,0,0,0]: bf16 scalar
            # vector.extracts crash Mosaic (PERFORMANCE.md gotchas)
            out_ref[2 * r:2 * r + 2, :, cso:cso + cu, :] = jnp.zeros(
                (2, 2 * wbc, cu, b), dt)

    cp_s.wait()
    acc = jnp.zeros(sum_ref.shape, sum_ref.dtype)
    for r in range(rh):
        up = df._up2_block(sbuf[r:r + 3], fe[r:r + 1], fo[r:r + 1],
                           few, fow, 1, wbc)
        if cf and bf16fold:
            f16 = se_ref[2 * r:2 * r + 2]
            kb = kfm_ref[...].astype(dt)
            a16 = f16[:, :, 0:1, :] * kb[0].reshape(1, 1, cso, 1)
            for ci in range(1, cf):
                a16 = a16 + f16[:, :, ci:ci + 1, :] * kb[ci].reshape(
                    1, 1, cso, 1)
            se = a16.astype(jnp.float32) + up.astype(jnp.float32) + b_ref[...]
        elif cf:
            se = (df._fm_fold(se_ref[2 * r:2 * r + 2], kfm_ref, cso)
                  + up.astype(jnp.float32) + b_ref[...])
        else:
            se = se_ref[2 * r:2 * r + 2] + up + bias
        z = act(se)
        if sums:
            acc = acc + z.sum(axis=(0, 1))
        out_ref[2 * r:2 * r + 2, :, 0:cso, :] = z.astype(dt)
    if sums:
        sum_ref[...] += acc

    if cd and dispp:
        cp_d.wait()
        for r in range(rh):
            up = df._up2_block(dbuf[r:r + 3], fe[r:r + 1], fo[r:r + 1],
                               few, fow, 1, wbc)
            out_ref[2 * r:2 * r + 2, :, cso + cu:cso + cu + cd, :] = up
    elif cd:
        for r in range(rh):
            out_ref[2 * r:2 * r + 2, :, cso + cu:cso + cu + cd, :] = (
                jnp.zeros((2, 2 * wbc, cd, b), dt))


def _copy_kernel(se_ref, kfm_ref, xc_ref, b_ref, skip_any, disp_any,
                 out_ref, sum_ref, sbuf, dbuf, sem, *, rh, wbc, sh, sw,
                 cu, cso, cd, cf):
    """Pure-byte skeleton: same operands/blocks/DMAs, no lerp/ELU math."""
    i = pl.program_id(0)
    c0 = pl.program_id(1) * wbc
    cp_s = pltpu.make_async_copy(
        skip_any.at[pl.ds(i * rh, rh + 2), pl.ds(c0, wbc + 2)],
        sbuf, sem.at[0])
    cp_s.start()
    if cd:
        cp_d = pltpu.make_async_copy(
            disp_any.at[pl.ds(i * rh, rh + 2), pl.ds(c0, wbc + 2)],
            dbuf, sem.at[1])
        cp_d.start()

    @pl.when((i == 0) & (pl.program_id(1) == 0))
    def _():
        sum_ref[...] = jnp.zeros(sum_ref.shape, sum_ref.dtype)

    dt = out_ref.dtype
    b = out_ref.shape[3]
    for r in range(rh):
        src = xc_ref[r:r + 1, :, 0:cu, :].astype(dt)
        out_ref[2 * r:2 * r + 2, :, cso:cso + cu, :] = jnp.concatenate(
            [jnp.concatenate([src, src], axis=1).reshape(1, 2 * wbc, cu, b)]
            * 2, axis=0)
    cp_s.wait()
    csrc = se_ref[...] if not cf else jnp.broadcast_to(
        se_ref[:, :, 0:1, :], (2 * rh, 2 * wbc, cso, se_ref.shape[3]))
    out_ref[:, :, 0:cso, :] = csrc.astype(dt)
    if cd:
        cp_d.wait()
        for r in range(rh):
            src = dbuf[r:r + 1, 0:wbc].astype(dt)
            out_ref[2 * r:2 * r + 2, :, cso + cu:cso + cu + cd, :] = (
                jnp.concatenate([jnp.concatenate([src, src], axis=1)
                                 .reshape(1, 2 * wbc, cd, b)] * 2, axis=0))


def build(variant, se_fm, skip_h, xc, disp_h, bias, kfm):
    b, h, w = se_fm.shape[:3]
    cso = skip_h.shape[3]
    cf = se_fm.shape[3] if kfm is not None else 0
    h2 = skip_h.shape[1]
    cu = xc.shape[3] // 4
    cd = disp_h.shape[3] if disp_h is not None else 0
    ccat = cu + cso + cd

    se_t = df._to_hwcb(se_fm)
    kfm_in = (kfm.astype(jnp.float32)[:, :, None] if kfm is not None
              else jnp.zeros((1, cso, 1), jnp.float32))
    skip_t = df._to_hwcb(df._pad_half(skip_h))
    xc_t = df._to_hwcb(xc)
    disp_t = (df._to_hwcb(df._pad_half(disp_h)) if disp_h is not None
              else jnp.zeros((1, 1, 1, b), se_fm.dtype))
    h2_, w2 = skip_h.shape[1], skip_h.shape[2]
    sh = np.float32(h2_ - 1) / np.float32(h - 1)
    sw = np.float32(w2 - 1) / np.float32(w - 1)

    # pad48 variants: pad the cat tensor's channel dim to the next sublane
    # multiple (44 -> 48) — misaligned 44-channel tiles force partial-tile
    # RMW on every store; the pad is exact for the consumer (zero input
    # channels of the iconv are a no-op)
    if variant.startswith("pad48"):
        ccat = -(-ccat // 8) * 8
        variant = variant[6:] or "full"

    it = se_fm.dtype.itemsize
    per_cell = (
        2 * (2 * ccat * b * it + 2 * cso * b * it + 2 * cu * b * it)
        + ((cso + cd) * b * it) * 3 // 2
        + cso * b * 2
    )
    rh, wb = df._pick_blocks(h2, w, per_cell)
    wbc = wb // 2

    flags = dict(elu=True, sums=True, xup=True, dispp=True)
    if variant == "bf16fold":
        flags["bf16fold"] = True
    elif variant == "noelu":
        flags["elu"] = False
    elif variant == "nosum":
        flags["sums"] = False
    elif variant == "noxup":
        flags["xup"] = False
    elif variant == "nodisp":
        flags["dispp"] = False
    elif variant == "bare":
        flags = dict(elu=False, sums=False, xup=False, dispp=False)

    if variant == "copy":
        kern = functools.partial(_copy_kernel, rh=rh, wbc=wbc, sh=sh, sw=sw,
                                 cu=cu, cso=cso, cd=cd, cf=cf)
    else:
        kern = functools.partial(_kernel, rh=rh, wbc=wbc, sh=sh, sw=sw,
                                 cu=cu, cso=cso, cd=cd, cf=cf, **flags)

    # operands returned alongside run and passed as jit ARGUMENTS — closing
    # over them would embed ~GB literal constants in the serialized HLO and
    # break the remote-compile tunnel (broken pipe)
    def run(se_t, kfm_in, xc_t, bias2, skip_t, disp_t):
        return pl.pallas_call(
            kern,
            grid=(h2 // rh, w // wb),
            in_specs=[
                pl.BlockSpec((2 * rh, wb, cf or cso, b),
                             lambda i, j: (i, j, 0, 0),
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
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=df._VMEM_LIMIT),
        )(se_t, kfm_in, xc_t, bias2, skip_t, disp_t)
    operands = (se_t, kfm_in, xc_t,
                bias.reshape(cso, 1).astype(jnp.float32), skip_t, disp_t)
    return run, operands, (rh, wb)


def main():
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    which = [int(a) for a in sys.argv[1:] if a.isdigit()] or [4, 3]
    variants = os.environ.get(
        "VARIANTS", "full,noelu,nosum,noxup,nodisp,bare,copy").split(",")
    reps = int(os.environ.get("REPS", "5"))
    B = int(os.environ.get("B", "128"))
    dt = jnp.bfloat16

    for s in which:
        H, W, cso, cu, cd = STAGES[s]
        h2, w2 = H // 2, W // 2
        ks = jax.random.split(jax.random.PRNGKey(s), 6)
        # production dec4 runs the kfm fold (cf=3); deeper stages don't
        cf = 3 if s == 4 else 0
        if cf:
            se_fm = jax.random.normal(ks[0], (B, H, W, cf), dt)
            kfm = jax.random.normal(ks[5], (cf, cso), jnp.float32) * 0.2
        else:
            se_fm = jax.random.normal(ks[0], (B, H, W, cso), dt)
            kfm = None
        skip_h = jax.random.normal(ks[1], (B, h2, w2, cso), dt)
        xc = jax.random.normal(ks[2], (B, h2, w2, 4 * cu), dt)
        disp = jax.random.normal(ks[3], (B, h2, w2, cd), dt)
        bias = jax.random.normal(ks[4], (cso,), dt)

        print(f"stage {s}: {H}x{W} Cso={cso} Cu={cu} cf={cf} (batch {B})",
              flush=True)
        for v in variants:
            # "blk:RHxWB" entries time the FULL kernel under a block-shape
            # override (UMT_FUSED_BLOCKS, read by df._pick_blocks)
            if v.startswith("blk:"):
                os.environ["UMT_FUSED_BLOCKS"] = v[4:].replace("x", ",")
                vv = "full"
            else:
                os.environ.pop("UMT_FUSED_BLOCKS", None)
                vv = v
            try:
                run, operands, (rh, wb) = build(
                    vv, se_fm, skip_h, xc, disp, bias, kfm)
            except Exception as e:
                print(f"  {v:12s} BUILD FAIL: {type(e).__name__}", flush=True)
                continue

            # time n async dispatches, block once at the end: the queue
            # stays full so per-call tunnel latency hides; copy/bare give
            # the in-harness byte floor for calibration
            f = jax.jit(lambda *ops: run(*ops)[0][0, 0, 0, 0])
            try:
                float(f(*operands))
            except Exception as e:
                print(f"  {v:12s} COMPILE FAIL: {type(e).__name__}",
                      flush=True)
                continue
            best = float("inf")
            for _ in range(reps):
                n = 8
                t0 = time.perf_counter()
                for _ in range(n):
                    out = f(*operands)
                # scalar fetch: block_until_ready is not a completion
                # barrier through the tunnel
                float(out)
                best = min(best, (time.perf_counter() - t0) / n)
            print(f"  {v:12s} rh={rh} wb={wb}  {best*1e3:7.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
