#!/usr/bin/env python3
"""Round-3 design microbenchmarks (decoder stage-3/4 rewrite candidates).

Questions this answers on the real chip:

  A. 2x align-corners upsample PRODUCING space-to-depth form (4 phase
     channels at input res, pure elementwise lerps, channel concat instead
     of spatial interleave) vs the round-2 dense interp-matrix matmul
     (20.5 ms at the stage-4 skip shape) vs the native-form lerp.
  B. depth_to_space relayout cost at the shapes where an s2d decoder
     would have to exit back to native layout.
  C. Is transpose (B,H,W,C)->(H,W,C,B) free (bitcast) given XLA already
     holds these activations batch-minor?  Decides whether Pallas kernels
     can use batch-in-lanes matmuls without paying a relayout.
  D. 1x1 conv at full res on the C=3 image (stage-4 se_conv feature half).

Methodology: chained data-dependent passes (utils/benchmark.py rationale),
slope between two loop lengths.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from uncertainty_model_tpu.ops.resize import _interp_matrix, _lerp_coeffs
from uncertainty_model_tpu.ops.s2d import depth_to_space


def timeit(fn, *args, k1=2, k2=8, reps=3, feedback=None):
    """ms per call of fn(*args); fn's output is fed back into args[0]
    through `feedback(out, x)` (defaults to a mean-perturbation)."""
    if feedback is None:
        def feedback(out, x):
            m = jnp.mean(out.astype(jnp.float32)).astype(x.dtype)
            return x * (1.0 + 1e-6 * m)

    def make(k):
        @jax.jit
        def run(x, *rest):
            def body(_, x):
                return feedback(fn(x, *rest), x)
            x = lax.fori_loop(0, k, body, x)
            return jnp.mean(x.astype(jnp.float32))
        return run

    r1, r2 = make(k1), make(k2)
    float(r1(*args)); float(r2(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); float(r1(*args))
        t1 = time.perf_counter(); float(r2(*args))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (k2 - k1))
    return best * 1e3


# --- A: 2x upsample variants -------------------------------------------------


def _phase_weights(n, dtype):
    _, _, frac = _lerp_coeffs(2 * n, n)
    return (jnp.asarray(frac[0::2], dtype), jnp.asarray(frac[1::2], dtype))


def _shift(x, axis, delta):
    n = x.shape[axis]
    if delta == -1:
        head = lax.slice_in_dim(x, 0, 1, axis=axis)
        return jnp.concatenate([head, lax.slice_in_dim(x, 0, n - 1, axis=axis)], axis)
    tail = lax.slice_in_dim(x, n - 1, n, axis=axis)
    return jnp.concatenate([lax.slice_in_dim(x, 1, n, axis=axis), tail], axis)


def upsample2_to_s2d(x):
    """(B,H,W,C) -> (B,H,W,4C) where channel block p=2*di+dj holds
    up2(x)[2i+di, 2j+dj, :].  Bit-identical values to _upsample2_axis."""
    b, h, w, c = x.shape
    we_h, wo_h = _phase_weights(h, x.dtype)
    we_w, wo_w = _phase_weights(w, x.dtype)
    we_h = we_h.reshape(1, h, 1, 1); wo_h = wo_h.reshape(1, h, 1, 1)
    we_w = we_w.reshape(1, 1, w, 1); wo_w = wo_w.reshape(1, 1, w, 1)

    xp = _shift(x, 1, -1)
    r0 = xp + we_h * (x - xp)                      # row phase 0
    xn = _shift(x, 1, +1)
    r1 = x + wo_h * (xn - x)                       # row phase 1

    out = []
    for r in (r0, r1):
        rp = _shift(r, 2, -1)
        out.append(rp + we_w * (r - rp))           # col phase 0
        rn = _shift(r, 2, +1)
        out.append(r + wo_w * (rn - r))            # col phase 1
    return jnp.concatenate(out, axis=-1)


def upsample2_matmul(x):
    m_h = jnp.asarray(_interp_matrix(2 * x.shape[1], x.shape[1]), x.dtype)
    m_w = jnp.asarray(_interp_matrix(2 * x.shape[2], x.shape[2]), x.dtype)
    y = jnp.einsum("oi,biwc->bowc", m_h, x)
    return jnp.einsum("oi,bhic->bhoc", m_w, y)


def main():
    jax.config.update("jax_default_matmul_precision", "bfloat16")
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    key = jax.random.PRNGKey(0)
    B = 128

    print("== A: 2x upsample (stage-4 skip 32ch@128x256, stage-3 skip 64ch@64x128)")
    for shape in [(B, 128, 256, 32), (B, 64, 128, 64), (B, 128, 256, 4)]:
        x = jax.random.uniform(key, shape, jnp.bfloat16)
        # correctness at tiny batch (f32 full-batch temporaries OOM the chip)
        xs = x[:2].astype(jnp.float32)
        err = float(jax.jit(lambda v: jnp.max(jnp.abs(
            depth_to_space(upsample2_to_s2d(v)) - upsample2_matmul(v))))(xs))
        t_s2d = timeit(upsample2_to_s2d, x)
        t_mm = timeit(upsample2_matmul, x)
        t_s2d_d2s = timeit(lambda v: depth_to_space(upsample2_to_s2d(v)), x)
        print(f"  {shape}: to-s2d {t_s2d:6.2f} ms | matmul {t_mm:6.2f} ms | "
              f"to-s2d+d2s {t_s2d_d2s:6.2f} ms | maxerr {err:.2e}", flush=True)

    print("== B: pure d2s relayout")
    for shape in [(B, 128, 256, 128), (B, 64, 128, 256)]:
        x = jax.random.uniform(key, shape, jnp.bfloat16)
        t = timeit(depth_to_space, x)
        gb = float(np.prod(shape)) * 2 * 2 / 1e9
        print(f"  {shape}: {t:6.2f} ms  ({gb:.2f} GB r+w -> roofline ~{gb/0.8*1e3/1e3:.2f} ms)",
              flush=True)

    print("== C: transpose to (H,W,C,B) after a conv (bitcast if batch-minor)")
    for c in (32, 64):
        x = jax.random.uniform(key, (B, 128, 256, c), jnp.bfloat16)
        w = jax.random.uniform(key, (3, 3, c, c), jnp.bfloat16)

        def conv_t(x, w):
            y = lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                         dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.transpose(y, (1, 2, 3, 0))

        def conv_only(x, w):
            return lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                            dimension_numbers=("NHWC", "HWIO", "NHWC"))

        fb = lambda out, x: x * (1.0 + 1e-6 * jnp.mean(out.astype(jnp.float32)).astype(x.dtype))
        t1 = timeit(conv_only, x, w, feedback=fb)
        t2 = timeit(conv_t, x, w, feedback=fb)
        print(f"  C={c}: conv {t1:6.2f} ms | conv+transpose {t2:6.2f} ms "
              f"(delta = transpose cost)", flush=True)

    print("== D: stage-4 feature 1x1 conv (image C3->32 at 256x512)")
    img = jax.random.uniform(key, (B, 256, 512, 3), jnp.bfloat16)
    w1 = jax.random.uniform(key, (1, 1, 3, 32), jnp.bfloat16)

    def feat(img, w1):
        return lax.conv_general_dilated(img, w1, (1, 1), "VALID",
                                        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    fb = lambda out, x: x * (1.0 + 1e-6 * jnp.mean(out.astype(jnp.float32)).astype(x.dtype))
    print(f"  native: {timeit(feat, img, w1, feedback=fb):6.2f} ms "
          f"(out 1.07 GB -> roofline ~1.5 ms)", flush=True)

    # s2d variant: image pre-s2d'd, block-diag kernel
    from uncertainty_model_tpu.ops.s2d import space_to_depth
    img_s = space_to_depth(img)
    w_bd = jnp.zeros((1, 1, 12, 128), jnp.bfloat16)
    for p in range(4):
        w_bd = w_bd.at[0, 0, p * 3:(p + 1) * 3, p * 32:(p + 1) * 32].set(w1[0, 0])
    print(f"  s2d block-diag: {timeit(feat, img_s, w_bd, feedback=fb):6.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
