#!/usr/bin/env python3
"""Honest inference throughput measurement.

Round-1's harness ran K identical forward passes inside one program; XLA
CSE'd them into a single pass (verified: the K=3 HLO is instruction-identical
to the K=1 HLO), inflating fps by exactly K.  Here each pass's input depends
on the previous pass's output (a negligible elementwise perturbation), so
the chain cannot be collapsed; throughput is the slope between two loop
lengths, cancelling dispatch/tunnel overhead.

Measures the FLAX eval path (model.apply) by default — NOT the serving
path bench.py reports (1235 vs 852 fps at batch 128, round 5); pass
--serving for the production serving forward with build defaults.

Usage: python tools/measure_fps.py [batch ...] [--dtype=f32] [--serving]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from uncertainty_model_tpu.utils.benchmark import measure_forward as measure  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "bfloat16")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _load_config
    from uncertainty_model_tpu.models import RandomlyConnectedModel

    batches = [int(a) for a in sys.argv[1:] if a.isdigit()] or [64]
    dtype = jnp.float32 if "--dtype=f32" in sys.argv else jnp.bfloat16

    config = _load_config()
    model = RandomlyConnectedModel.from_config(**config["model"], dtype=dtype)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 512, 3)), disp_scale=1.0
    )
    if dtype == jnp.bfloat16:
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            variables,
        )

    if "--serving" in sys.argv:
        from uncertainty_model_tpu.serving import make_serving_forward
        model_f32 = RandomlyConnectedModel.from_config(**config["model"])
        v32 = model_f32.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 256, 512, 3)), disp_scale=1.0)
        fwd, variables = make_serving_forward(
            model_f32, v32, s2d_stages=(),
            dtype=None if dtype == jnp.float32 else dtype)

        def apply_fn(variables, x):
            return fwd(variables, x)
    else:
        def apply_fn(variables, x):
            return model.apply(variables, x, disp_scale=1.0)[0]

    for batch in batches:
        sec = measure(apply_fn, variables, batch)
        print(f"batch {batch}: {sec*1e3:.2f} ms/pass, {batch/sec:.1f} fps",
              flush=True)


if __name__ == "__main__":
    main()
