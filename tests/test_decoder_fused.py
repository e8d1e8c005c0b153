"""Fused decoder-stage glue kernels (ops/pallas/decoder_fused.py): the
Pallas kernels (interpret mode) must match the pure-JAX fallback — which is
itself the exact unfused serving math (pinned against flax eval and the
PyTorch reference via tests/test_serving.py / test_model_parity.py).

Reference semantics: model/layers/decoder.py:210-249 (DecoderStage),
decoder.py:111-136 (SELayer), F.interpolate align_corners=True.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import uncertainty_model_tpu.ops.pallas.decoder_fused as df


@pytest.fixture(autouse=True)
def interpret_mode():
    df._INTERPRET = True
    yield
    df._INTERPRET = False


def _inputs(seed, b=4, h2=8, w2=16, cso=16, cu=8, cd=4):
    rng = np.random.default_rng(seed)
    h, w = 2 * h2, 2 * w2
    return (
        jnp.asarray(rng.normal(size=(b, h, w, cso)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, h2, w2, cso)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, h2, w2, 4 * cu)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, h2, w2, cd)), jnp.float32),
        jnp.asarray(rng.uniform(size=(b, cso)), jnp.float32),
        jnp.asarray(rng.normal(size=(cso,)), jnp.float32),
    )


class TestAssembleZ:
    def test_matches_fallback(self):
        se_fm, skip_h, xc, disp, gates, bias = _inputs(0)
        df._INTERPRET = False
        ref_cat, ref_mean = df.assemble_z(se_fm, skip_h, xc, disp, bias)
        df._INTERPRET = True
        cat, mean = df.assemble_z(se_fm, skip_h, xc, disp, bias)
        # the last odd row/column lerp coefficient may differ by ~1 ulp
        # (decoder_fused.py docstring) — tolerance covers it
        np.testing.assert_allclose(np.asarray(cat), np.asarray(ref_cat),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean),
                                   rtol=1e-5, atol=1e-6)

    def test_no_disp(self):
        se_fm, skip_h, xc, _, gates, bias = _inputs(1)
        df._INTERPRET = False
        ref_cat, ref_mean = df.assemble_z(se_fm, skip_h, xc, None, bias)
        df._INTERPRET = True
        cat, mean = df.assemble_z(se_fm, skip_h, xc, None, bias)
        assert cat.shape[-1] == se_fm.shape[-1] + xc.shape[-1] // 4
        np.testing.assert_allclose(np.asarray(cat), np.asarray(ref_cat),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean),
                                   rtol=1e-5, atol=1e-6)

    def test_channel_order(self):
        """cat = [z | xup | disp]: z first (gate_z scales channel block 0)."""
        se_fm, skip_h, xc, disp, _, bias = _inputs(2)
        cat, _ = df.assemble_z(se_fm, skip_h, xc, disp, bias)
        from uncertainty_model_tpu.ops.resize import resize_bilinear
        h, w = se_fm.shape[1], se_fm.shape[2]
        z = jax.nn.elu(se_fm + resize_bilinear(skip_h, (h, w)) + bias)
        np.testing.assert_allclose(np.asarray(cat[..., :z.shape[-1]]),
                                   np.asarray(z), rtol=1e-4, atol=1e-5)


class TestAssembleGated:
    """The squeeze-first pipeline kernels: gated assemble + se_squeeze,
    with and without the in-kernel fm fold (k_fm)."""

    def test_matches_fallback(self):
        se_fm, skip_h, xc, disp, gates, bias = _inputs(4)
        df._INTERPRET = False
        ref = df.assemble(se_fm, skip_h, gates, xc, disp, bias)
        df._INTERPRET = True
        cat = df.assemble(se_fm, skip_h, gates, xc, disp, bias)
        np.testing.assert_allclose(np.asarray(cat), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_matches_assemble_z_plus_gate(self):
        """assemble(gates) == gate_z(assemble_z(...)) — same channel order,
        same values (the two serving pipelines must be interchangeable)."""
        se_fm, skip_h, xc, disp, gates, bias = _inputs(5)
        cat_a = df.assemble(se_fm, skip_h, gates, xc, disp, bias)
        cat_z, mean = df.assemble_z(se_fm, skip_h, xc, disp, bias)
        cat_b = df.gate_z(cat_z, gates, se_fm.shape[-1])
        np.testing.assert_allclose(np.asarray(cat_a), np.asarray(cat_b),
                                   rtol=1e-5, atol=1e-6)

    def test_fm_fold(self):
        _, skip_h, xc, disp, gates, bias = _inputs(6)
        rng = np.random.default_rng(60)
        b, h2, w2, cso = skip_h.shape
        fm = jnp.asarray(rng.normal(size=(b, 2 * h2, 2 * w2, 3)), jnp.float32)
        k_fm = jnp.asarray(rng.normal(size=(3, cso)), jnp.float32)
        se_fm = jnp.einsum("bhwc,co->bhwo", fm, k_fm)
        ref = df.assemble(se_fm, skip_h, gates, xc, disp, bias)
        cat = df.assemble(fm, skip_h, gates, xc, disp, bias, k_fm=k_fm)
        np.testing.assert_allclose(np.asarray(cat), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
        ref_z, _ = df.assemble_z(se_fm, skip_h, xc, disp, bias)
        cat_z, _ = df.assemble_z(fm, skip_h, xc, disp, bias, k_fm=k_fm)
        np.testing.assert_allclose(np.asarray(cat_z), np.asarray(ref_z),
                                   rtol=1e-4, atol=1e-5)

    def test_se_squeeze(self):
        se_fm, skip_h, xc, disp, gates, bias = _inputs(7)
        df._INTERPRET = False
        ref = df.se_squeeze(se_fm, skip_h, bias)
        df._INTERPRET = True
        mean = df.se_squeeze(se_fm, skip_h, bias)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
        # squeeze == assemble_z's mean output
        _, mean_z = df.assemble_z(se_fm, skip_h, xc, disp, bias)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_z),
                                   rtol=1e-5, atol=1e-6)

    def test_se_squeeze_fm_fold(self):
        _, skip_h, _, _, _, bias = _inputs(8)
        rng = np.random.default_rng(80)
        b, h2, w2, cso = skip_h.shape
        fm = jnp.asarray(rng.normal(size=(b, 2 * h2, 2 * w2, 3)), jnp.float32)
        k_fm = jnp.asarray(rng.normal(size=(3, cso)), jnp.float32)
        se_fm = jnp.einsum("bhwc,co->bhwo", fm, k_fm)
        ref = df.se_squeeze(se_fm, skip_h, bias)
        mean = df.se_squeeze(fm, skip_h, bias, k_fm=k_fm)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_no_disp(self):
        se_fm, skip_h, xc, _, gates, bias = _inputs(9)
        df._INTERPRET = False
        ref = df.assemble(se_fm, skip_h, gates, xc, None, bias)
        df._INTERPRET = True
        cat = df.assemble(se_fm, skip_h, gates, xc, None, bias)
        np.testing.assert_allclose(np.asarray(cat), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


class TestGateZ:
    def test_scales_z_and_preserves_rest(self):
        rng = np.random.default_rng(3)
        cat = jnp.asarray(rng.normal(size=(4, 16, 32, 44)), jnp.float32)
        gates = jnp.asarray(rng.uniform(size=(4, 32)), jnp.float32)
        out = df.gate_z(cat, gates, 32)
        np.testing.assert_allclose(
            np.asarray(out[..., :32]),
            np.asarray(cat[..., :32] * gates[:, None, None, :]), rtol=1e-6)
        # the aliased, unwritten channel block must be byte-identical
        np.testing.assert_array_equal(np.asarray(out[..., 32:]),
                                      np.asarray(cat[..., 32:]))


class TestLerpCoeffParity:
    def test_weights_match_lerp_coeffs(self):
        """The in-kernel fraction formulas reproduce ops/resize.py
        _lerp_coeffs bit-for-bit (interior outputs)."""
        from uncertainty_model_tpu.ops.resize import _lerp_coeffs
        for n in (8, 16, 128, 256):
            lo, hi, frac = _lerp_coeffs(2 * n, n)
            s = np.float32(n - 1) / np.float32(2 * n - 1)
            w = np.arange(n, dtype=np.int32)
            fe = s * (2.0 * w).astype(np.float32) - (w - 1).astype(np.float32)
            fo = s * (2.0 * w + 1).astype(np.float32) - w.astype(np.float32)
            # even outputs: frac against lo=w-1 (w>=1); at w=0 the kernel's
            # fe==1 with a zero pad produces x[0] exactly like frac=0
            np.testing.assert_array_equal(fe[1:], frac[0::2][1:])
            assert fe[0] == np.float32(1.0)
            # odd outputs: identical except the clamped last column
            np.testing.assert_array_equal(fo[:-1], frac[1::2][:-1])
