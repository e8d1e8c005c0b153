#!/usr/bin/env python3
"""Block-size sweep for the fused decoder kernels (each kernel timed alone,
chained passes).  Usage:
    python tools/sweep_fused_blocks.py <stage> <kernel a|b> rh,wb [rh,wb ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = {
    2: (64, 128, 128, 32, 4),
    3: (128, 256, 64, 16, 4),
    4: (256, 512, 32, 8, 4),
}


def main():
    stage = int(sys.argv[1])
    which = sys.argv[2]
    combos = sys.argv[3:]

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    H, W, cso, cu, cd = STAGES[stage]
    B = 128
    h2, w2 = H // 2, W // 2
    dt = jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(stage), 6)
    se_fm = jax.random.normal(ks[0], (B, H, W, cso), dt)
    skip_h = jax.random.normal(ks[1], (B, h2, w2, cso), dt)
    xc = jax.random.normal(ks[2], (B, h2, w2, 4 * cu), dt)
    disp = jax.random.normal(ks[3], (B, h2, w2, cd), dt)
    gates = jax.nn.sigmoid(jax.random.normal(ks[4], (B, cso), dt))
    bias = jax.random.normal(ks[5], (cso,), dt)

    for combo in combos:
        os.environ["UMT_FUSED_BLOCKS"] = combo
        import importlib
        import uncertainty_model_tpu.ops.pallas.decoder_fused as df
        importlib.reload(df)

        if which == "a":
            def fn(se_fm, skip_h, xc, disp, gates, bias):
                m = df.se_squeeze(se_fm, skip_h, bias)
                return se_fm * (1 + 1e-6 * jnp.mean(m).astype(dt))
        elif which == "z":
            def fn(se_fm, skip_h, xc, disp, gates, bias):
                cat, m = df.assemble_z(se_fm, skip_h, xc, disp, bias)
                eps = (1e-6 * jnp.mean(cat[..., :1].astype(jnp.float32))
                       + 1e-6 * jnp.mean(m))
                return se_fm * (1 + eps.astype(dt))
        else:
            def fn(se_fm, skip_h, xc, disp, gates, bias):
                cat = df.assemble(se_fm, skip_h, gates, xc, disp, bias)
                eps = 1e-6 * jnp.mean(cat[..., :1].astype(jnp.float32))
                return se_fm * (1 + eps.astype(dt))

        def make(k):
            @jax.jit
            def run(se_fm, *rest):
                se_fm = jax.lax.fori_loop(
                    0, k, lambda _, s: fn(s, *rest), se_fm)
                return jnp.mean(se_fm.astype(jnp.float32))
            return run

        args = (se_fm, skip_h, xc, disp, gates, bias)
        try:
            r1, r2 = make(2), make(8)
            float(r1(*args)); float(r2(*args))
            t0 = time.perf_counter(); float(r1(*args))
            t1 = time.perf_counter(); float(r2(*args))
            t2 = time.perf_counter()
            ms = ((t2 - t1) - (t1 - t0)) / 6 * 1e3
            print(f"stage{stage} kernel-{which} blocks={combo}: {ms:7.2f} ms",
                  flush=True)
        except Exception as e:
            print(f"stage{stage} kernel-{which} blocks={combo}: FAIL "
                  f"{str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
