#!/usr/bin/env python3
"""Ablation of the fused assemble kernel's z path at stage-4 shapes: which
piece costs what.  Variants: full | noelu | nolerp | nointerleave | copy.
Usage: python tools/ablate_fused_kernel.py [variants...]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, H, W, cso = 128, 256, 512, 32
    h2, w2 = H // 2, W // 2
    dt = jnp.bfloat16
    rh, wb = 4, 128
    wbc = wb // 2
    sh = np.float32(h2 - 1) / np.float32(H - 1)
    sw = np.float32(w2 - 1) / np.float32(W - 1)

    def kernel(se_ref, skip_any, out_ref, sbuf, sem, *, variant):
        i = pl.program_id(0)
        wb_ = pl.program_id(1)
        c0 = wb_ * wbc
        cp = pltpu.make_async_copy(
            skip_any.at[pl.ds(i * rh, rh + 2), pl.ds(c0, wbc + 2)], sbuf, sem)
        cp.start()

        r_ = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1), 0)
        fi = (r_ + i * rh).astype(jnp.float32)
        m = jax.lax.broadcasted_iota(jnp.int32, (1, wbc, 1, 1), 1) + c0
        fm = m.astype(jnp.float32)
        few = (sw * (2.0 * fm) - (fm - 1.0)).astype(dt)
        fow = (sw * (2.0 * fm + 1.0) - fm).astype(dt)

        cp.wait()
        for r in range(rh):
            fr = fi + r
            fe = (sh * (2.0 * fr) - (fr - 1.0)).astype(dt)[0]
            fo = (sh * (2.0 * fr + 1.0) - fr).astype(dt)[0]
            buf = sbuf[r:r + 3]
            if variant == "copy":
                out_ref[2 * r:2 * r + 2] = jnp.stack(
                    [buf[0, 0:wbc], buf[1, 0:wbc]], axis=0).repeat(2, axis=1)
                continue
            if variant == "nolerp":
                rows = jnp.stack([buf[0:1], buf[1:2]], axis=1).reshape(
                    2, wbc + 2, cso, B)
            else:
                prev, cur, nxt = buf[0:1], buf[1:2], buf[2:3]
                er = prev + fe * (cur - prev)
                orow = cur + fo * (nxt - cur)
                rows = jnp.stack([er, orow], axis=1).reshape(
                    2, wbc + 2, cso, B)
            if variant == "stride":
                # strided stores: no stack/reshape materialization
                pc, cc, nc = rows[:, 0:wbc], rows[:, 1:wbc + 1], rows[:, 2:wbc + 2]
                ec = pc + few * (cc - pc)
                oc = cc + fow * (nc - cc)
                see = se_ref[2 * r:2 * r + 2, 0:wb:2] + ec
                seo = se_ref[2 * r:2 * r + 2, 1:wb:2] + oc
                ye = see.astype(jnp.float32)
                yo = seo.astype(jnp.float32)
                ze = jnp.where(ye > 0, ye, jnp.exp(ye) - 1.0)
                zo = jnp.where(yo > 0, yo, jnp.exp(yo) - 1.0)
                out_ref[2 * r:2 * r + 2, 0:wb:2] = ze.astype(dt)
                out_ref[2 * r:2 * r + 2, 1:wb:2] = zo.astype(dt)
                continue
            if variant == "repshift":
                u = rows.repeat(2, axis=1)      # (2, 2*(wbc+2), cso, B)
                a = u[:, 1:wb + 1]
                bq = u[:, 3:wb + 3]
                fz = jnp.stack([few, fow], axis=2).reshape(1, wb, 1, 1)
                up = a + fz * (bq - a)
                se = se_ref[2 * r:2 * r + 2] + up
                y = se.astype(jnp.float32)
                z = jnp.where(y > 0, y, jnp.exp(y) - 1.0)
                out_ref[2 * r:2 * r + 2] = z.astype(dt)
                continue
            if variant == "nointerleave":
                up = rows[:, 0:wbc].repeat(2, axis=1)
            else:
                pc, cc, nc = rows[:, 0:wbc], rows[:, 1:wbc + 1], rows[:, 2:wbc + 2]
                ec = pc + few * (cc - pc)
                oc = cc + fow * (nc - cc)
                up = jnp.stack([ec, oc], axis=2).reshape(2, wb, cso, B)
            se = se_ref[2 * r:2 * r + 2] + up
            if variant == "noelu":
                z = se.astype(jnp.float32)
            else:
                y = se.astype(jnp.float32)
                z = jnp.where(y > 0, y, jnp.exp(y) - 1.0)
            out_ref[2 * r:2 * r + 2] = z.astype(dt)

    @functools.partial(jax.jit, static_argnames=("variant",))
    def run_kernel(se_t, skip_t, variant):
        return pl.pallas_call(
            functools.partial(kernel, variant=variant),
            grid=(h2 // rh, W // wb),
            in_specs=[
                pl.BlockSpec((2 * rh, wb, cso, B), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((2 * rh, wb, cso, B),
                                   lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W, cso, B), dt),
            scratch_shapes=[
                pltpu.VMEM((rh + 2, wbc + 2, cso, B), dt),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(se_t, skip_t)

    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    se_t = jax.random.normal(ks[0], (H, W, cso, B), dt)
    skip_t = jax.random.normal(ks[1], (h2 + 2, w2 + 2, cso, B), dt)

    variants = sys.argv[1:] or ["full", "noelu", "nolerp", "nointerleave", "copy"]
    for v in variants:
        def fn(se_t, skip_t):
            z = run_kernel(se_t, skip_t, v)
            return se_t * (1 + 1e-6 * jnp.mean(z[..., :1, :].astype(jnp.float32)).astype(dt))

        def make(k):
            @jax.jit
            def run(se_t, skip_t):
                se_t = jax.lax.fori_loop(
                    0, k, lambda _, s: fn(s, skip_t), se_t)
                return jnp.mean(se_t.astype(jnp.float32))
            return run
        try:
            r1, r2 = make(2), make(8)
            float(r1(se_t, skip_t)); float(r2(se_t, skip_t))
            t0 = time.perf_counter(); float(r1(se_t, skip_t))
            t1 = time.perf_counter(); float(r2(se_t, skip_t))
            t2 = time.perf_counter()
            print(f"variant {v:14s}: {((t2-t1)-(t1-t0))/6*1e3:7.2f} ms", flush=True)
        except Exception as e:
            print(f"variant {v:14s}: FAIL {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
