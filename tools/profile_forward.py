#!/usr/bin/env python3
"""Component-level forward-pass timing on the real chip.

The tunnel makes per-op profiling awkward, so this times jitted sub-programs
(same methodology as bench.py: k passes in one program, scalar fetch,
subtract measured round-trip) for: full model, encoder, encoder-sans-
attention, attention alone, decoder alone — in f32 and bf16.

Usage: python tools/profile_forward.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _load_config  # noqa: E402
from uncertainty_model_tpu.models import RandomlyConnectedModel  # noqa: E402

jax.config.update("jax_default_matmul_precision", "bfloat16")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 3


def timed(fn, *args, reps=3):
    float(fn(*args))  # compile+warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    config = _load_config()
    model = RandomlyConnectedModel.from_config(**config["model"])
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 512, 3)), disp_scale=1.0
    )
    x = jnp.full((batch, 256, 512, 3), 0.5, jnp.float32)

    @jax.jit
    def roundtrip(x):
        return x[0, 0, 0, 0] + 0.0

    overhead = timed(roundtrip, x)
    print(f"overhead: {overhead*1e3:.1f}ms", flush=True)

    def report(name, fn, *args):
        t = timed(fn, *args)
        per = (t - overhead) / K
        print(f"{name:28s} {per*1e3:8.2f} ms/pass   {batch/per:8.1f} fps", flush=True)
        return per

    def loop(apply_fn):
        @jax.jit
        def run(v, x):
            acc = jnp.float32(0)
            for _ in range(K):
                acc = acc + apply_fn(v, x)
            return acc
        return run

    # full model f32 IO
    report("full forward (f32 io)", loop(
        lambda v, xx: jnp.mean(model.apply(v, xx, disp_scale=1.0)[0])), variables, x)

    # full model bf16 everything
    v16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                       if a.dtype == jnp.float32 else a, variables)
    x16 = x.astype(jnp.bfloat16)
    report("full forward (bf16)", loop(
        lambda v, xx: jnp.mean(model.apply(v, xx, disp_scale=1.0)[0].astype(jnp.float32))),
        v16, x16)

    # encoder only
    enc = model.encoder
    enc_vars = {"params": variables["params"]["encoder"],
                "batch_stats": variables["batch_stats"]["encoder"]}
    report("encoder (f32)", loop(
        lambda v, xx: sum(jnp.mean(f) for f in enc.apply(v, xx))), enc_vars, x)

    enc_vars16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                              if a.dtype == jnp.float32 else a, enc_vars)
    report("encoder (bf16)", loop(
        lambda v, xx: sum(jnp.mean(f.astype(jnp.float32)) for f in enc.apply(v, xx))),
        enc_vars16, x16)

    # decoder only (uses encoder features captured once)
    feats = enc.apply(enc_vars, x)
    dec = model.decoder
    dec_vars = {"params": variables["params"]["decoder"],
                "batch_stats": variables["batch_stats"]["decoder"]}

    @jax.jit
    def dec_loop(v, xx, feats):
        acc = jnp.float32(0)
        for _ in range(K):
            acc = acc + jnp.mean(dec.apply(v, xx, *feats, disp_scale=1.0)[0])
        return acc

    t = timed(dec_loop, dec_vars, x, feats)
    per = (t - overhead) / K
    print(f"{'decoder (f32)':28s} {per*1e3:8.2f} ms/pass   {batch/per:8.1f} fps",
          flush=True)


if __name__ == "__main__":
    main()
