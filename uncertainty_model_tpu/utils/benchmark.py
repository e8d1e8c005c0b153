"""Honest on-device throughput measurement.

Methodology notes (TPU v5e behind this environment's tunnel):

* ``block_until_ready`` is not a reliable completion barrier here and
  host<->device copies carry ~30 ms latency, so a scalar fetch from the
  compiled program is used as the barrier.
* K passes run inside ONE compiled program; throughput is the slope between
  two loop lengths, cancelling dispatch/tunnel overhead.
* Each pass's input depends on the previous pass's output via a negligible
  elementwise perturbation.  Without this, XLA common-subexpression-
  eliminates identical passes into one (verified: a K=3 unrolled program
  compiled to instruction-identical HLO as K=1), silently inflating fps by
  exactly K — this bug inflated the round-1 numbers by 3x.
"""

from __future__ import annotations

import time


def measure_forward_samples(apply_fn, variables, batch: int, *, k1: int = 2,
                            k2: int = 8, reps: int = 3,
                            image_hw=(256, 512)) -> list:
    """Per-repetition seconds-per-pass samples for
    ``apply_fn(variables, x) -> (B,H,W,4)`` (one slope measurement each)."""
    import jax
    import jax.numpy as jnp

    def make(k):
        @jax.jit
        def run(variables, x):
            def body(_, x):
                out = apply_fn(variables, x)
                # data-dependence between passes (defeats CSE); epsilon keeps
                # activations in range so timing matches the real workload
                return x * (1.0 + 1e-6 * out[..., :3].astype(x.dtype))
            x = jax.lax.fori_loop(0, k, body, x.astype(jnp.bfloat16))
            return jnp.mean(x.astype(jnp.float32))
        return run

    r1, r2 = make(k1), make(k2)
    h, w = image_hw
    x = jnp.full((batch, h, w, 3), 0.5, jnp.float32)
    float(r1(variables, x))
    float(r2(variables, x))
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(r1(variables, x))
        t1 = time.perf_counter()
        float(r2(variables, x))
        t2 = time.perf_counter()
        samples.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
    return samples


def measure_forward(apply_fn, variables, batch: int, *, k1: int = 2,
                    k2: int = 8, reps: int = 3,
                    image_hw=(256, 512)) -> float:
    """Best-of-reps seconds per forward pass (see module docstring)."""
    return min(measure_forward_samples(apply_fn, variables, batch, k1=k1,
                                       k2=k2, reps=reps, image_hw=image_hw))
