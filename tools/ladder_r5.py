#!/usr/bin/env python3
"""Round-5 serving-config ladder: measure several serving pipelines
end-to-end (flagship model, batch 128 bf16, chained-pass harness) in ONE
process, interleaving the repetitions A/B/A/B so tunnel drift cannot
masquerade as a config delta (round-4 verdict: bench spread tripled to
2.5%, making 10-fps ladder steps unattributable).

Usage:
    python tools/ladder_r5.py [config ...]

where each config is "name=pipeline,elu_fold[,smax[,fused_stages]]" e.g.
    gate_z=gate_z,0  gfold=gate_fold,0  gfold_elu=gate_fold,1
    gfold_w=gate_fold,0,window  f1234=gate_fold,0,nomax,1234
Default: the round-5 candidate set.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = ["gate_z=gate_z,0", "gfold=gate_fold,0", "gfold_elu=gate_fold,1"]


def main():
    specs = sys.argv[1:] or DEFAULT
    reps = int(os.environ.get("REPS", "5"))

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "bfloat16")
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _load_config
    from uncertainty_model_tpu.models import RandomlyConnectedModel
    from uncertainty_model_tpu.serving import make_serving_forward

    config = _load_config()
    model = RandomlyConnectedModel.from_config(**config["model"])
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 512, 3)), disp_scale=1.0)

    batch = 128
    k1, k2 = 2, 8
    x = jnp.full((batch, 256, 512, 3), 0.5, jnp.float32)

    runs = {}
    for spec in specs:
        name, rest = spec.split("=")
        parts = rest.split(",")
        pipeline, elu = parts[0], parts[1]
        smax = parts[2] if len(parts) > 2 else None
        fstages = (tuple(int(c) for c in parts[3]) if len(parts) > 3
                   else (2, 3, 4))
        fwd, params = make_serving_forward(
            model, variables, s2d_stages=(), dtype=jnp.bfloat16,
            dec_pipeline=pipeline, elu_fold=elu != "0", smax=smax,
            fused_stages=fstages)

        def make(k, fwd=fwd):
            @jax.jit
            def run(params, x):
                def body(_, x):
                    out = fwd(params, x)
                    return x * (1.0 + 1e-6 * out[..., :3].astype(x.dtype))
                x = jax.lax.fori_loop(0, k, body, x.astype(jnp.bfloat16))
                return jnp.mean(x.astype(jnp.float32))
            return run

        r1, r2 = make(k1), make(k2)
        t0 = time.perf_counter()
        float(r1(params, x))
        float(r2(params, x))
        print(f"[{name}] compiled+warm in {time.perf_counter()-t0:.1f}s",
              flush=True)
        runs[name] = (r1, r2, params)

    samples = {name: [] for name in runs}
    for rep in range(reps):
        for name, (r1, r2, params) in runs.items():
            t0 = time.perf_counter()
            float(r1(params, x))
            t1 = time.perf_counter()
            float(r2(params, x))
            t2 = time.perf_counter()
            samples[name].append(((t2 - t1) - (t1 - t0)) / (k2 - k1))

    print(f"\n{'config':<14}{'ms/pass':>9}{'fps':>8}{'spread':>8}")
    for name, ss in samples.items():
        ss = sorted(ss)
        med = ss[len(ss) // 2]
        spread = (ss[-1] - ss[0]) / med
        print(f"{name:<14}{med*1e3:9.2f}{batch/med:8.1f}{spread*100:7.1f}%",
              flush=True)


if __name__ == "__main__":
    main()
