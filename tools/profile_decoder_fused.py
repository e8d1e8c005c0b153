#!/usr/bin/env python3
"""Microbenchmark: fused decoder-stage glue kernels (ops/pallas/decoder_fused)
vs the unfused XLA formulation, at the production stage shapes (batch 128
bf16).  Chained-pass methodology (data-dependent passes, scalar barrier,
slope between two loop lengths) — see utils/benchmark.py.

Usage: python tools/profile_decoder_fused.py [stage indices, default 2 3 4]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (H, W, Cso, Cu, cd) at 256x512 input, batch 128 — configs/uncertainty.yml
STAGES = {
    2: (64, 128, 128, 32, 4),
    3: (128, 256, 64, 16, 4),
    4: (256, 512, 32, 8, 4),
}


def main():
    import jax
    import jax.numpy as jnp

    import uncertainty_model_tpu.ops.pallas.decoder_fused as df
    from uncertainty_model_tpu.ops.resize import resize_bilinear
    from uncertainty_model_tpu.ops.shuffle import pixel_shuffle

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    which = [int(a) for a in sys.argv[1:] if a.isdigit()] or [4, 3, 2]
    B = 128
    dt = jnp.bfloat16

    def bench(label, fn, ops, k1=2, k2=10):
        def make(k):
            @jax.jit
            def run(ops):
                def body(_, ops):
                    cat = fn(*ops)
                    eps = 1e-6 * jnp.mean(cat.astype(jnp.float32)).astype(dt)
                    return (ops[0] * (1 + eps),) + ops[1:]
                ops = jax.lax.fori_loop(0, k, body, ops)
                return jnp.mean(ops[0][..., :1].astype(jnp.float32))
            return run
        r1, r2 = make(k1), make(k2)
        float(r1(ops)); float(r2(ops))
        t0 = time.perf_counter(); float(r1(ops))
        t1 = time.perf_counter(); float(r2(ops))
        t2 = time.perf_counter()
        ms = ((t2 - t1) - (t1 - t0)) / (k2 - k1) * 1e3
        print(f"  {label:30s} {ms:8.2f} ms/pass", flush=True)
        return ms

    for s in which:
        H, W, cso, cu, cd = STAGES[s]
        h2, w2 = H // 2, W // 2
        key = jax.random.PRNGKey(s)
        ks = jax.random.split(key, 6)
        se_fm = jax.random.normal(ks[0], (B, H, W, cso), dt)
        skip_h = jax.random.normal(ks[1], (B, h2, w2, cso), dt)
        xc = jax.random.normal(ks[2], (B, h2, w2, 4 * cu), dt)
        disp = jax.random.normal(ks[3], (B, h2, w2, cd), dt)
        gates = jax.nn.sigmoid(jax.random.normal(ks[4], (B, cso), dt))
        bias = jax.random.normal(ks[5], (cso,), dt)
        print(f"stage {s}: {H}x{W} Cso={cso} Cu={cu} (batch {B} bf16)")

        def fused(se_fm, skip_h, xc, disp, gates, bias):
            m = df.se_squeeze(se_fm, skip_h, bias).astype(dt)
            g = jax.nn.sigmoid(m @ jnp.ones((cso, cso), dt) * 0.01) * gates
            return df.assemble(se_fm, skip_h, g, xc, disp, bias)

        def unfused(se_fm, skip_h, xc, disp, gates, bias):
            se = se_fm + resize_bilinear(skip_h, (H, W)) + bias
            z = jax.nn.elu(se)
            m = jnp.mean(z, axis=(1, 2), dtype=jnp.float32).astype(dt)
            g = jax.nn.sigmoid(m @ jnp.ones((cso, cso), dt) * 0.01) * gates
            zs = z * g[:, None, None, :]
            xup = pixel_shuffle(jax.nn.elu(xc), 2)
            du = resize_bilinear(disp, (H, W))
            # [z | xup | disp] — the channel order assemble() emits
            return jnp.concatenate([zs, xup, du], axis=-1)

        ops = (se_fm, skip_h, xc, disp, gates, bias)
        f = bench("fused (pallas)", fused, ops)
        u = bench("unfused (xla)", unfused, ops)
        print(f"  speedup {u / f:.2f}x")


if __name__ == "__main__":
    main()
