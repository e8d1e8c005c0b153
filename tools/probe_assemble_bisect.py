#!/usr/bin/env python3
"""Bisect which construct in assemble_cm Mosaic rejects at stage-4 shapes.

Each variant is a stripped kernel exercising ONE suspect:
  dma_out   — manual async copy from a VMEM scratch to an ANY output
  border    — @pl.when border DMAs with traced destination offsets
  concat    — the full-width _padded concat stores (1+w+1+slack pieces)
  updot     — the lerp + kfm matmul z-path
  xup       — the phase-major pixel-shuffle stack stores

Usage: python tools/probe_assemble_bisect.py <variant> [variant...]
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

B = 128
H, W, CSO, CU, CD, CF = 256, 512, 32, 8, 4, 3
CCAT = CSO + CU + CD
WP = W + 2 + ((-(W + 2)) % 8)
RH = 2
H2, W2 = H // 2, W // 2
NPROG = H2 // RH


def _kernel(x_ref, out_ref, obuf, sem, *, variant):
    i = pl.program_id(0)
    dt = out_ref.dtype
    w, b = W, B

    if variant in ("lerp", "dot", "zfull"):
        import uncertainty_model_tpu.ops.pallas.decoder_cmajor as dc
        from uncertainty_model_tpu.ops.pallas.decoder_fused import _row_weights
        sh = np.float32(H2 - 1) / np.float32(H - 1)
        sw = np.float32(W2 - 1) / np.float32(W - 1)
        fe, fo = _row_weights(i, RH, sh, dt)
        few, fow = dc._col_weights_cm(W2, sw, dt)
        kfm = jnp.full((CSO, CF), 0.1, dt)
        sb = jnp.zeros((RH + 2, CSO, W2 + 2 + 6, B), dt)  # stand-in DMA buf
        bias = jnp.zeros((CSO, 1), jnp.float32)
        for r in range(RH):
            if variant in ("lerp", "zfull"):
                up = dc._up2_block_cm(sb[r:r + 3], fe[r:r + 1], fo[r:r + 1],
                                      few, fow, 1, W2)
            else:
                up = jnp.zeros((2, CSO, w, b), dt)
            if variant in ("dot", "zfull"):
                se_fm = jnp.stack([
                    jax.lax.dot_general(
                        kfm, x_ref[r, 0:CF * 4].reshape(4 * CF, w // 2 * b)[0:CF].reshape(CF, w // 2 * b),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    for _ in (0, 1)], axis=0)
                se_fm = jnp.concatenate([se_fm, se_fm], axis=2).reshape(2, CSO, w, b)
            else:
                se_fm = jnp.zeros((2, CSO, w, b), jnp.float32)
            se = se_fm + up.astype(jnp.float32) + bias.reshape(1, CSO, 1, 1)
            z32 = jnp.where(se > 0, se, jnp.exp(se) - 1.0)
            z = z32.astype(dt)
            zp = jnp.zeros((2, CSO, WP - w - 2, b), dt)
            obuf[2 * r:2 * r + 2, 0:CSO] = jnp.concatenate(
                [z[:, :, 1:2], z, z[:, :, w - 2:w - 1], zp], axis=2)
        cp = pltpu.make_async_copy(
            obuf, out_ref.at[pl.ds(2 * i * RH + 2, 2 * RH)], sem)
        cp.start()
        cp.wait()
        return

    if variant == "xup":
        for r in range(RH):
            planes = [x_ref[r, p * CU:(p + 1) * CU].astype(dt)
                      for p in range(4)]
            rows = [jnp.stack([planes[2 * a], planes[2 * a + 1]],
                              axis=2).reshape(CU, w, b) for a in (0, 1)]
            xup = jnp.stack(rows, axis=0)
            zp = jnp.zeros((2, CU, WP - w - 2, b), dt)
            v = jnp.concatenate(
                [xup[:, :, 1:2], xup, xup[:, :, w - 2:w - 1], zp], axis=2)
            obuf[2 * r:2 * r + 2, CSO:CSO + CU] = v
    elif variant == "concat":
        for r in range(2 * RH):
            body = x_ref[r // 2, 0:CSO, 0:w // 2].astype(dt)
            body = jnp.concatenate([body, body], axis=1)  # fake full-width
            zp = jnp.zeros((CSO, WP - w - 2, b), dt)
            v = jnp.concatenate(
                [body[:, 1:2], body, body[:, w - 2:w - 1], zp], axis=1)
            obuf[r, 0:CSO] = v
    else:
        obuf[...] = jnp.zeros(obuf.shape, dt)

    cp = pltpu.make_async_copy(obuf, out_ref.at[pl.ds(2 * i * RH + 2, 2 * RH)],
                               sem)
    cp.start()
    cp.wait()

    if variant == "border":
        @pl.when(i == 0)
        def _():
            for src, dst in ((2, 0), (1, 1)):
                c = pltpu.make_async_copy(obuf.at[pl.ds(src, 1)],
                                          out_ref.at[pl.ds(dst, 1)], sem)
                c.start()
                c.wait()

        @pl.when(i == NPROG - 1)
        def _():
            base = 2 * i * RH + 2
            for src, dst in ((2 * RH - 2, base + 2 * RH),
                             (2 * RH - 3, base + 2 * RH + 1)):
                c = pltpu.make_async_copy(obuf.at[pl.ds(src, 1)],
                                          out_ref.at[pl.ds(dst, 1)], sem)
                c.start()
                c.wait()


def run_variant(variant):
    x = jnp.zeros((H2, 4 * CU, W2, B), jnp.bfloat16)
    fn = pl.pallas_call(
        functools.partial(_kernel, variant=variant),
        grid=(NPROG,),
        in_specs=[pl.BlockSpec((RH, 4 * CU, W2, B), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((H + 4, CCAT, WP, B), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2 * RH, CCAT, WP, B), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    t0 = time.perf_counter()
    try:
        out = jax.jit(fn)(x)
        float(out.reshape(-1)[0].astype(jnp.float32))
        print(f"{variant:8s}: OK  compile {time.perf_counter()-t0:.1f}s",
              flush=True)
    except Exception as e:
        print(f"{variant:8s}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)


if __name__ == "__main__":
    for v in sys.argv[1:] or ["dma_out", "border", "xup", "concat"]:
        run_variant(v)
