#!/usr/bin/env python3
"""Compile + time the channel-major decoder kernels stage by stage at
production shapes (batch 128) — bisects Mosaic compile blowups and gives
per-kernel device timings.

Usage: python tools/probe_cmajor_stages.py [assemble|tail|both] [2|3|4 ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "bfloat16")

import uncertainty_model_tpu.ops.pallas.decoder_cmajor as dc

B = 128
# stage: (h, w, cf, cso, cu, cd_in, co, cd_out, cu4_next, cso_next)
STAGES = {
    0: (16, 32, 8, 16, 8, 4, 16, 4, 8, 8),   # tiny: fast-compile repro
    2: (64, 128, 64, 128, 32, 4, 128, 4, 64, 64),
    3: (128, 256, 32, 64, 16, 4, 64, 4, 32, 32),
    4: (256, 512, 3, 32, 8, 4, 32, 4, 0, 0),
}


def fetch(out):
    leaf = jax.tree.leaves(out)[0]
    return float(leaf.reshape(-1)[0].astype(jnp.float32))


def timeit(fn, *args, reps=20):
    t0 = time.perf_counter()
    out = fn(*args)
    fetch(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    fetch(fn(*args))
    overhead = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fetch(out)
    return compile_s, max(time.perf_counter() - t0 - overhead, 0) / reps


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    stages = [int(a) for a in sys.argv[2:]] or [4, 3, 2]
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def rand(shape, scale=1.0):
        return jnp.asarray(rng.normal(size=shape) * scale, dt)

    for s in stages:
        h, w, cf, cso, cu, cd, co, cdo, cu4n, cson = STAGES[s]
        h2, w2 = h // 2, w // 2
        ccat = cso + cu + cd
        wa = dc._align8(w2 + 2)
        wp = dc._align8(w + 2)

        if which in ("assemble", "both"):
            fm = rand((h, cf, w, B))
            kfm = rand((cso, cf), 0.2)
            xc = rand((h2, 4 * cu, w2, B))
            skip = rand((h2 + 2, cso, wa, B))
            disp = rand((h2 + 2, cd, wa, B))
            bias = jnp.zeros((cso,), jnp.float32)
            fn = jax.jit(lambda *a: dc.assemble_cm(*a, cso=cso, cu=cu, cd=cd))
            try:
                c, t = timeit(fn, fm, kfm, xc, skip, disp, bias)
                print(f"stage{s} assemble: compile {c:7.1f}s  run {t*1e3:7.2f} ms",
                      flush=True)
            except Exception as e:
                print(f"stage{s} assemble: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

        if which in ("tail", "both"):
            # assemble emits align8-padded channels with a zeroed pad block
            ccatp = dc._align8(ccat)
            cat = rand((h + 4, ccatp, wp, B))
            if ccatp > ccat:
                cat = cat.at[:, ccat:].set(0)
            gates = jnp.asarray(rng.uniform(size=(cso, B)), jnp.float32)
            kt_ic = rand((3, co, 3 * ccat), 0.1)
            bic = jnp.zeros((co,), jnp.float32)
            kt_d = rand((3, cdo, 3 * co), 0.1)
            bd = jnp.zeros((cdo,), jnp.float32)
            if cu4n:
                kt_up = rand((3, cu4n, 3 * co), 0.1)
                bup = jnp.zeros((cu4n,), jnp.float32)
                ksk = rand((cson, cso), 0.2)
            else:
                kt_up = bup = ksk = None
            fn = jax.jit(lambda *a: dc.tail_cm(*a, cso=cso, co=co, cd=cdo, w=w))
            try:
                c, t = timeit(fn, cat, gates, kt_ic, bic, kt_d, bd,
                              jnp.float32(0.7), kt_up, bup, ksk)
                print(f"stage{s} tail:     compile {c:7.1f}s  run {t*1e3:7.2f} ms",
                      flush=True)
            except Exception as e:
                print(f"stage{s} tail:     FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
