#!/usr/bin/env python3
"""Microbenchmarks of decoder sub-ops on the real chip (suspects: the
align-corners gather-lerp resize, pixel-shuffle transpose, reflect-pad convs,
squeeze-excite reductions)."""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
from flax import linen as nn

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uncertainty_model_tpu.ops import pad2d, pixel_shuffle, resize_bilinear  # noqa: E402

jax.config.update("jax_default_matmul_precision", "bfloat16")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 8
B = 32


def timed(fn, *args, reps=3):
    float(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


@jax.jit
def roundtrip(x):
    return x[0, 0, 0, 0] + 0.0


def loop(f):
    @jax.jit
    def run(x):
        acc = jnp.float32(0)
        for i in range(K):
            # distinct scale per iteration prevents CSE collapsing the K calls
            y = f(x * (1.0 + 1e-6 * i))
            acc = acc + jnp.sum(y[..., :1, :1, :1]).astype(jnp.float32)
        return acc
    return run


def report(name, f, x, overhead):
    t = timed(loop(f), x)
    per = (t - overhead) / K
    print(f"{name:44s} {per*1e3:8.2f} ms", flush=True)


def main():
    x_small = jnp.ones((B, 16, 32, 512), jnp.float32)
    overhead = timed(roundtrip, x_small)
    print(f"overhead {overhead*1e3:.1f}ms", flush=True)

    # 1. align-corners resize x2 of the deepest skip (512ch)
    report("resize 16x32x512 -> 32x64 (f32)",
           lambda x: resize_bilinear(x, (32, 64)), x_small, overhead)

    # 2. resize at shallow stage (full-res disp concat path)
    x_disp = jnp.ones((B, 128, 256, 4), jnp.float32)
    report("resize 128x256x4 -> 256x512 (f32)",
           lambda x: resize_bilinear(x, (256, 512)), x_disp, overhead)

    x_skip3 = jnp.ones((B, 64, 128, 64), jnp.float32)
    report("resize 64x128x64 -> 128x256 (f32)",
           lambda x: resize_bilinear(x, (128, 256)), x_skip3, overhead)

    # 3. pixel shuffle after conv (stage 4 shape)
    x_ps = jnp.ones((B, 128, 256, 32), jnp.float32)
    report("pixel_shuffle r2 128x256x32", lambda x: pixel_shuffle(x, 2), x_ps, overhead)

    # 4. reflect-pad + k3 conv at full res (stage4 iconv 44->32)
    conv = nn.Conv(32, (3, 3), padding="VALID")
    cvars = conv.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 10, 44)))
    x_ic = jnp.ones((B, 256, 512, 44), jnp.float32)
    report("reflect-pad+conv3 256x512 44->32 (f32)",
           lambda x: conv.apply(cvars, pad2d(x, (1, 1, 1, 1), "reflect")), x_ic, overhead)

    report("zero-pad conv3 256x512 44->32 (f32)",
           lambda x: conv.apply(cvars, pad2d(x, (1, 1, 1, 1), "zeros")), x_ic, overhead)

    # 5. SE layer ops at stage1 shape
    x_se = jnp.ones((B, 32, 64, 256), jnp.float32)
    w1 = jnp.ones((256, 16), jnp.float32)
    w2 = jnp.ones((16, 256), jnp.float32)

    def se(x):
        s = jnp.mean(x, axis=(1, 2))
        s = jax.nn.sigmoid(jax.nn.relu(s @ w1) @ w2)
        return x * s[:, None, None, :]

    report("squeeze-excite 32x64x256", se, x_se, overhead)

    # 6. full-res sigmoid disp head conv 32->4
    dconv = nn.Conv(4, (3, 3), padding="VALID")
    dvars = dconv.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 10, 32)))
    x_d = jnp.ones((B, 256, 512, 32), jnp.float32)
    report("disp head conv3 256x512 32->4",
           lambda x: jax.nn.sigmoid(dconv.apply(dvars, pad2d(x, (1, 1, 1, 1), "reflect"))),
           x_d, overhead)


if __name__ == "__main__":
    main()
