#!/usr/bin/env python3
"""Trace the EXACT chained-pass program that bench.py measures.

tools/trace_infer.py jits the forward directly; XLA assigns that program
different parameter/IO layouts than the chained fori_loop harness
(measured: 204 ms/pass direct-jit vs 134.6 ms chained at round-3 start), so
its attribution does not match the benched program.  This tool builds the
same ``make(k)`` loop as utils/benchmark.py, traces one call, and divides
all durations by k.

Usage:
    python tools/trace_chained.py [batch] [outdir] [--s2d 0,1] [--k K]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = sys.argv[1:]
    batch = int(args[0]) if args and args[0].isdigit() else 128
    outdir = (args[1] if len(args) > 1 and not args[1].startswith("-")
              else "/tmp/trace_chained")
    s2d = ()
    k = 3
    dec_backend = "fused"
    pipeline = None
    elu_fold = None
    for i, a in enumerate(args):
        if a == "--s2d":
            s2d = tuple(int(v) for v in args[i + 1].split(",") if v != "")
        if a == "--k":
            k = int(args[i + 1])
        if a == "--decoder":     # fused | direct (no fused stages)
            dec_backend = args[i + 1]
        if a == "--pipeline":    # gate_z | gate_fold | squeeze_first
            pipeline = args[i + 1]
        if a == "--elu-fold":
            elu_fold = args[i + 1] != "0"

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _load_config
    from uncertainty_model_tpu.models import RandomlyConnectedModel
    from uncertainty_model_tpu.serving import make_serving_forward

    jax.config.update("jax_default_matmul_precision", "bfloat16")
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    config = _load_config()
    model = RandomlyConnectedModel.from_config(**config["model"])
    raw = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 512, 3)),
                     disp_scale=1.0)
    serving_fwd, variables = make_serving_forward(
        model, raw, s2d_stages=s2d, dtype=jnp.bfloat16,
        fused_stages=() if dec_backend == "direct" else (2, 3, 4),
        dec_pipeline=pipeline, elu_fold=elu_fold)

    @jax.jit
    def run(variables, x):
        def body(_, x):
            out = serving_fwd(variables, x)
            return x * (1.0 + 1e-6 * out[..., :3].astype(x.dtype))
        x = jax.lax.fori_loop(0, k, body, x.astype(jnp.bfloat16))
        return jnp.mean(x.astype(jnp.float32))

    x = jnp.full((batch, 256, 512, 3), 0.5, jnp.float32)

    lowered = run.lower(variables, x)
    compiled = lowered.compile()
    os.makedirs(outdir, exist_ok=True)
    hlo_path = os.path.join(outdir, "hlo.txt")
    with open(hlo_path, "w") as f:
        f.write(compiled.as_text())

    float(run(variables, x))  # warm
    import time
    t0 = time.perf_counter()
    with jax.profiler.trace(outdir):
        float(run(variables, x))
    wall = time.perf_counter() - t0
    print(f"trace + hlo in {outdir}; k={k} passes, wall {wall*1e3:.1f} ms "
          f"({wall/k*1e3:.1f} ms/pass incl. dispatch)", flush=True)
    os.execv(sys.executable, [
        sys.executable,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "analyze_trace.py"),
        outdir, hlo_path, "3", str(k),
    ])


if __name__ == "__main__":
    main()
