#!/usr/bin/env python3
"""Capture a device trace + HLO of the production inference forward and
print the per-module time attribution (joins with tools/analyze_trace.py).

Usage:
    python tools/trace_infer.py [batch] [outdir] [--serving [--s2d 0,1]]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = sys.argv[1:]
    batch = int(args[0]) if args and args[0].isdigit() else 128
    outdir = (args[1] if len(args) > 1 and not args[1].startswith("-")
              else "/tmp/trace_infer")
    s2d = ()
    for i, a in enumerate(args):
        if a == "--s2d":
            s2d = tuple(int(v) for v in args[i + 1].split(","))

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _load_config
    from uncertainty_model_tpu.models import RandomlyConnectedModel

    jax.config.update("jax_default_matmul_precision", "bfloat16")
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    config = _load_config()
    if "--serving" in args:
        from uncertainty_model_tpu.serving import make_serving_forward

        model = RandomlyConnectedModel.from_config(**config["model"])
        raw = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 512, 3)),
                         disp_scale=1.0)
        serving_fwd, variables = make_serving_forward(
            model, raw, s2d_stages=s2d, dtype=jnp.bfloat16)

        @jax.jit
        def fwd(variables, x):
            return serving_fwd(variables, x)
    else:
        model = RandomlyConnectedModel.from_config(**config["model"],
                                                   dtype=jnp.bfloat16)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 256, 512, 3)), disp_scale=1.0
        )
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            variables,
        )

        @jax.jit
        def fwd(variables, x):
            return model.apply(variables, x, disp_scale=1.0)[0]

    x = jnp.full((batch, 256, 512, 3), 0.5, jnp.float32)

    lowered = fwd.lower(variables, x)
    compiled = lowered.compile()
    os.makedirs(outdir, exist_ok=True)
    hlo_path = os.path.join(outdir, "hlo.txt")
    with open(hlo_path, "w") as f:
        f.write(compiled.as_text())

    fwd(variables, x).block_until_ready()  # warm
    with jax.profiler.trace(outdir):
        for _ in range(3):
            out = fwd(variables, x)
        out.block_until_ready()

    print(f"trace + hlo in {outdir}")
    os.execv(sys.executable, [
        sys.executable,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "analyze_trace.py"),
        outdir, hlo_path, "3",
    ])


if __name__ == "__main__":
    main()
