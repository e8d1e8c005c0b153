"""Serving path (BN folding + gate precompute + s2d stages) must equal
``model.apply(..., train=False)`` — the flax eval path that is itself
golden-pinned against the PyTorch reference (tests/test_model_parity.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tiny_config import TINY_INPUT, TINY_MODEL

from uncertainty_model_tpu.models import RandomlyConnectedModel
from uncertainty_model_tpu.serving import make_serving_forward

# tiny config but with the production kernel sizes in the early stages so
# the space-to-depth path (k=7 -> 5x5, k=5 -> 3x3) is actually exercised
S2D_MODEL = {
    "encoder": {
        **TINY_MODEL["encoder"],
        "layers": [
            {"in_channels": 3, "out_channels": 8, "kernel_size": 7, "heads": 2},
            {"in_channels": 8, "out_channels": 8, "kernel_size": 5, "heads": 2},
            *TINY_MODEL["encoder"]["layers"][2:],
        ],
    },
    "decoder": TINY_MODEL["decoder"],
}


@pytest.fixture(scope="module")
def trained_variables():
    """Random-init variables with non-trivial batch statistics (a few
    train-mode applies mutate the BN running stats, so BN folding is
    actually tested against real means/vars)."""
    model = RandomlyConnectedModel.from_config(**S2D_MODEL)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, *TINY_INPUT, 3))
    variables = model.init(rng, x, disp_scale=1.0)
    for i in range(3):
        xi = jax.random.uniform(jax.random.PRNGKey(i + 1), (2, *TINY_INPUT, 3))
        _, mutated = model.apply(variables, xi, disp_scale=1.0, train=True,
                                 mutable=["batch_stats"])
        variables = {"params": variables["params"], **mutated}
    return model, variables


class TestServingParity:
    def test_f32_matches_eval_apply(self, trained_variables):
        model, variables = trained_variables
        x = jax.random.uniform(jax.random.PRNGKey(42), (2, *TINY_INPUT, 3))
        ref = model.apply(variables, x, disp_scale=0.7)[0]

        fwd, params = make_serving_forward(model, variables, dtype=None)
        got = jax.jit(fwd, static_argnames=())(params, x, jnp.float32(0.7))

        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_s2d_stages_equivalent(self, trained_variables):
        model, variables = trained_variables
        x = jax.random.uniform(jax.random.PRNGKey(7), (1, *TINY_INPUT, 3))

        fwd_direct, p_direct = make_serving_forward(
            model, variables, s2d_stages=(), dtype=None)
        fwd_s2d, p_s2d = make_serving_forward(
            model, variables, s2d_stages=(0, 1), dtype=None)

        a = fwd_direct(p_direct, x)
        b = fwd_s2d(p_s2d, x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    def test_s2d_native_attention_equivalent(self, trained_variables):
        """s2d graph execution with the attention run natively (one
        depth_to_space after the graph, untransformed attention kernels)
        must match the direct path exactly like the full-s2d mode."""
        model, variables = trained_variables
        x = jax.random.uniform(jax.random.PRNGKey(9), (1, *TINY_INPUT, 3))

        fwd_direct, p_direct = make_serving_forward(
            model, variables, s2d_stages=(), dtype=None)
        fwd_n, p_n = make_serving_forward(
            model, variables, s2d_stages=(0, 1), dtype=None,
            s2d_conv_backend="lax", s2d_attention="native")

        a = fwd_direct(p_direct, x)
        b = fwd_n(p_n, x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    def test_unknown_decoder_backend_rejected(self, trained_variables):
        """The cmajor experiment was deleted in round 5 (stage-3 Mosaic
        compile failure on real TPU, no speedup at stage 4 — see
        docs/PERFORMANCE.md); asking for it must fail loudly."""
        model, variables = trained_variables
        with pytest.raises(ValueError, match="decoder_backend"):
            make_serving_forward(model, variables, dtype=None,
                                 decoder_backend="cmajor")

    @pytest.mark.parametrize("pipeline,elu_fold", [
        ("gate_z", False), ("gate_fold", False), ("gate_fold", True),
        ("squeeze_first", False), ("gate_z", True),
    ])
    def test_pipelines_equivalent(self, trained_variables, pipeline,
                                  elu_fold):
        """Every decoder pipeline (gate_z rewrite, gate_fold conv-input
        gating, squeeze_first) with and without the consumer-side ELU fold
        must match the direct (unfused) path — they are graph
        reassociations, not approximations."""
        model, variables = trained_variables
        x = jax.random.uniform(jax.random.PRNGKey(13), (2, *TINY_INPUT, 3))

        fwd_direct, p_direct = make_serving_forward(
            model, variables, s2d_stages=(), dtype=None, fused_stages=())
        fwd, p = make_serving_forward(
            model, variables, s2d_stages=(), dtype=None,
            dec_pipeline=pipeline, elu_fold=elu_fold)

        a = fwd_direct(p_direct, x, 0.7)
        b = fwd(p, x, 0.7)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("fstages", [(1, 2, 3, 4), (0, 1, 2, 3, 4)])
    def test_extended_fused_stages_equivalent(self, trained_variables,
                                              fstages):
        """The fused-glue decoder supports every stage, not just the
        production (2,3,4) set (round-5 ladder: extending is
        perf-neutral, but the plumbing must stay exact — dec0 has no
        disparity to concat and dec1's skip handle is another fused
        stage's cat tensor)."""
        model, variables = trained_variables
        x = jax.random.uniform(jax.random.PRNGKey(23), (2, *TINY_INPUT, 3))
        fwd_d, p_d = make_serving_forward(
            model, variables, s2d_stages=(), dtype=None, fused_stages=())
        fwd_f, p_f = make_serving_forward(
            model, variables, s2d_stages=(), dtype=None, fused_stages=fstages)
        np.testing.assert_allclose(
            np.asarray(fwd_d(p_d, x, 0.7)), np.asarray(fwd_f(p_f, x, 0.7)),
            rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("formulation", ["slice", "nomax"])
    def test_smax_formulations_equivalent(self, trained_variables,
                                          formulation):
        """The grouped-softmax formulations compute the same softmax:
        window/slice differ only in the sum's association order; nomax
        drops the max subtraction (softmax(v) == exp(v)/sum(exp(v))
        identically — the subtraction only bounds exp's argument), so f32
        outputs must agree tightly."""
        model, variables = trained_variables
        x = jax.random.uniform(jax.random.PRNGKey(17), (2, *TINY_INPUT, 3))
        fwd_w, p_w = make_serving_forward(
            model, variables, s2d_stages=(), dtype=None, smax="window")
        fwd_v, p_v = make_serving_forward(
            model, variables, s2d_stages=(), dtype=None, smax=formulation)
        np.testing.assert_allclose(
            np.asarray(fwd_w(p_w, x, 0.7)), np.asarray(fwd_v(p_v, x, 0.7)),
            rtol=2e-5, atol=1e-6)

    def test_conv_se_variant(self):
        """fc=False decoder stages (reference model/layers/decoder.py:111-136
        conv-SE variant) fold and serve correctly (round-2 VERDICT missing
        #3: this used to KeyError at build time)."""
        cfg = {
            "encoder": TINY_MODEL["encoder"],
            "decoder": {
                "layers": [dict(d, fc=False)
                           for d in TINY_MODEL["decoder"]["layers"]],
            },
        }
        model = RandomlyConnectedModel.from_config(**cfg)
        rng = jax.random.PRNGKey(11)
        x = jax.random.uniform(rng, (2, *TINY_INPUT, 3))
        variables = model.init(rng, x, disp_scale=1.0)
        _, mutated = model.apply(variables, x, disp_scale=1.0, train=True,
                                 mutable=["batch_stats"])
        variables = {"params": variables["params"], **mutated}

        ref = model.apply(variables, x, disp_scale=1.0)[0]
        fwd, params = make_serving_forward(model, variables, dtype=None)
        got = fwd(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_bf16_is_finite_and_close(self, trained_variables):
        model, variables = trained_variables
        x = jax.random.uniform(jax.random.PRNGKey(3), (1, *TINY_INPUT, 3))
        ref = model.apply(variables, x, disp_scale=1.0)[0]

        fwd, params = make_serving_forward(model, variables, dtype=jnp.bfloat16)
        got = np.asarray(fwd(params, x)).astype(np.float32)
        assert np.isfinite(got).all()
        # sigmoid-bounded disparity maps: bf16 end-to-end stays within a few
        # representable steps of the f32 result
        assert np.abs(got - np.asarray(ref)).max() < 0.05
