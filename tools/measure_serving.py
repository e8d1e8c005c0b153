#!/usr/bin/env python3
"""Measure serving-path inference throughput on the production model.

Usage:
    python tools/measure_serving.py [batch] [--direct] [--s2d 0,1] [--model-apply]

``--model-apply`` measures the plain flax eval apply (the round-1 bench
path) for comparison.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = sys.argv[1:]
    batch = int(args[0]) if args and args[0].isdigit() else 128
    s2d = (0, 1)
    backend = "pallas"
    dec_backend = "fused"
    if "--direct" in args:
        s2d = ()
    for i, a in enumerate(args):
        if a == "--s2d":
            s2d = tuple(int(v) for v in args[i + 1].split(",") if v != "")
        if a == "--conv-backend":
            backend = args[i + 1]
        if a == "--decoder":
            dec_backend = args[i + 1]

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _load_config
    from uncertainty_model_tpu.models import RandomlyConnectedModel
    from uncertainty_model_tpu.utils.benchmark import measure_forward

    jax.config.update("jax_default_matmul_precision", "bfloat16")
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    config = _load_config()

    if "--model-apply" in args:
        model = RandomlyConnectedModel.from_config(**config["model"],
                                                   dtype=jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 512, 3)), disp_scale=1.0)
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            variables)

        def apply_fn(variables, x):
            return model.apply(variables, x, disp_scale=1.0)[0]

        label = "model.apply"
        operand = variables
    else:
        from uncertainty_model_tpu.serving import make_serving_forward

        model = RandomlyConnectedModel.from_config(**config["model"])
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 512, 3)), disp_scale=1.0)
        fwd, params = make_serving_forward(model, variables, s2d_stages=s2d,
                                           dtype=jnp.bfloat16,
                                           s2d_conv_backend=backend,
                                           decoder_backend=dec_backend)

        def apply_fn(params, x):
            return fwd(params, x)

        label = f"serving s2d={s2d} backend={backend} decoder={dec_backend}"
        operand = params

    sec = measure_forward(apply_fn, operand, batch)
    print(f"{label} batch={batch}: {sec*1e3:.2f} ms/pass, "
          f"{batch/sec:.1f} fps/chip", flush=True)


if __name__ == "__main__":
    main()
