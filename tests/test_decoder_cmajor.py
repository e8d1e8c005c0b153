"""Channel-major fused decoder kernels (ops/pallas/decoder_cmajor.py).

Two layers of pinning:
  1. the Pallas kernels (interpret mode) match the module's pure-JAX
     fallbacks bit-closely;
  2. the fallbacks match an independent composition of the production ops
     (resize_bilinear, reflect conv, phase-major pixel shuffle) — the same
     ops that are themselves golden-pinned against the PyTorch reference
     (tests/test_serving.py, test_model_parity.py).

Reference semantics: model/layers/decoder.py:210-249 (DecoderStage),
decoder.py:37-46 (reflect ConvLayer), F.interpolate align_corners=True.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import uncertainty_model_tpu.ops.pallas.decoder_cmajor as dc
from uncertainty_model_tpu.models.layers import _reflect_conv
from uncertainty_model_tpu.ops import resize_bilinear
from uncertainty_model_tpu.ops.pallas.decoder_fused import _shuffle_phase_major


@pytest.fixture(autouse=True)
def interpret_mode():
    dc._INTERPRET = True
    yield
    dc._INTERPRET = False


def _rand(rng, shape):
    return jnp.asarray(rng.normal(size=shape), jnp.float32)


def _stack_kt(k):
    """(3, 3, Ci, Co) HWIO -> (3, Co, 3Ci) column-stacked transposed form."""
    return jnp.stack([
        jnp.concatenate([k[u, v] for v in range(3)], axis=0).T
        for u in range(3)])


def _case(seed, h2=8, w2=16, cf=3, cso=16, cu=8, cd=4, co=12,
          cso_next=6, cu4_next=8):
    rng = np.random.default_rng(seed)
    h, w = 2 * h2, 2 * w2
    fm_t = _rand(rng, (h, cf, w, 4))
    kfm = _rand(rng, (cso, cf)) * 0.3
    xc_t = _rand(rng, (h2, 4 * cu, w2, 4))
    skip = _rand(rng, (h2, cso, w2, 4))
    disp = _rand(rng, (h2, cd, w2, 4))
    bias = _rand(rng, (cso,))
    gates = jnp.asarray(rng.uniform(size=(cso, 4)), jnp.float32)
    ki = _rand(rng, (3, 3, cso + cu + cd, co)) * 0.2
    bi = _rand(rng, (co,))
    kd = _rand(rng, (3, 3, co, cd)) * 0.2
    bd = _rand(rng, (cd,))
    kup = _rand(rng, (3, 3, co, cu4_next)) * 0.2
    bup = _rand(rng, (cu4_next,))
    ksk = _rand(rng, (cso_next, cso)) * 0.3
    return (fm_t, kfm, xc_t, skip, disp, bias, gates, ki, bi, kd, bd,
            kup, bup, ksk)


def _pad_half_cm(x):
    """zero-pad rows/cols by 1 and align the padded width to 8 (the
    assemble_cm input convention)."""
    h2, c, w2, b = x.shape
    wa = dc._align8(w2 + 2)
    return jnp.pad(x, ((1, 1), (0, 0), (1, wa - w2 - 1), (0, 0)))


def _reference_stage(case, with_disp=True, emit_next=True):
    """The same math through the production NHWC ops."""
    (fm_t, kfm, xc_t, skip, disp, bias, gates, ki, bi, kd, bd,
     kup, bup, ksk) = case
    h, w = fm_t.shape[0], fm_t.shape[2]

    def to_nhwc(t):  # (H, C, W, B) -> (B, H, W, C)
        return jnp.transpose(t, (3, 0, 2, 1))

    def to_cm(x):
        return jnp.transpose(x, (1, 3, 2, 0))

    fm = to_nhwc(fm_t)
    se = (jnp.einsum("bhwc,oc->bhwo", fm, kfm)
          + resize_bilinear(to_nhwc(skip), (h, w)) + bias)
    z = jax.nn.elu(se)
    sums = jnp.sum(z, axis=(1, 2)).T  # (cso, B)

    zg = z * jnp.transpose(gates)[:, None, None, :]
    xup = _shuffle_phase_major(jax.nn.elu(to_nhwc(xc_t)))
    parts = [zg, xup]
    if with_disp:
        parts.append(resize_bilinear(to_nhwc(disp), (h, w)))
    else:
        ki = ki[:, :, : zg.shape[-1] + xup.shape[-1]]
    cat = jnp.concatenate(parts, axis=-1)

    out = jax.nn.elu(_reflect_conv(cat, ki, bi))
    res = {"sums": sums}
    if with_disp:
        res["disp"] = to_cm(0.7 * jax.nn.sigmoid(_reflect_conv(out, kd, bd)))
    if emit_next:
        res["xc"] = to_cm(_reflect_conv(out, kup, bup))
        res["sk"] = to_cm(jnp.einsum("bhwc,oc->bhwo", zg, ksk))
    return res


def _run_chain(case, with_disp=True, emit_next=True):
    (fm_t, kfm, xc_t, skip, disp, bias, gates, ki, bi, kd, bd,
     kup, bup, ksk) = case
    cso, cu = skip.shape[1], xc_t.shape[1] // 4
    cd = disp.shape[1] if with_disp else 0
    co = ki.shape[3]
    w = fm_t.shape[2]
    if not with_disp:
        ki = ki[:, :, : cso + cu]

    cat, sums = dc.assemble_cm(
        fm_t, kfm, xc_t, _pad_half_cm(skip),
        _pad_half_cm(disp) if with_disp else None, bias, cso, cu, cd)
    d, xc, sk = dc.tail_cm(
        cat, gates, _stack_kt(ki), bi,
        _stack_kt(kd) if with_disp else jnp.zeros((3, 1, 3 * co)),
        bd if with_disp else jnp.zeros((1,)),
        0.7,
        _stack_kt(kup) if emit_next else None,
        bup if emit_next else None,
        ksk if emit_next else None,
        cso, co, cd, w)
    return {"sums": sums, "disp": d, "xc": xc, "sk": sk}


def _close(a, b, tol=1e-4):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=tol, atol=tol)


class TestKernelVsFallback:
    """interpret-mode Pallas == pure-JAX fallback."""

    @pytest.mark.parametrize("seed", [0, 3])
    def test_full_stage(self, seed):
        case = _case(seed)
        got = _run_chain(case)
        dc._INTERPRET = False
        want = _run_chain(case)
        dc._INTERPRET = True
        _close(got["sums"], want["sums"], 1e-3)
        _close(got["disp"], want["disp"])
        _close(got["xc"], want["xc"])
        _close(got["sk"], want["sk"])

    def test_no_disp_no_next(self):
        case = _case(1)
        got = _run_chain(case, with_disp=False, emit_next=False)
        dc._INTERPRET = False
        want = _run_chain(case, with_disp=False, emit_next=False)
        dc._INTERPRET = True
        _close(got["sums"], want["sums"], 1e-3)
        assert got["disp"] is None and want["disp"] is None
        assert got["xc"] is None and got["sk"] is None


class TestFallbackVsProductionOps:
    """the kernel algebra == independent composition of production ops."""

    @pytest.mark.parametrize("with_disp,emit_next",
                             [(True, True), (True, False), (False, True)])
    def test_stage(self, with_disp, emit_next):
        case = _case(7)
        ref = _reference_stage(case, with_disp, emit_next)
        got = _run_chain(case, with_disp, emit_next)
        _close(got["sums"], ref["sums"], 1e-3)
        if with_disp:
            _close(got["disp"], ref["disp"])
        if emit_next:
            _close(got["xc"], ref["xc"])
            _close(got["sk"], ref["sk"])

    def test_odd_sizes(self):
        """non-8-aligned widths exercise the alignment padding."""
        case = _case(9, h2=6, w2=10)
        ref = _reference_stage(case)
        got = _run_chain(case)
        _close(got["disp"], ref["disp"])
        _close(got["xc"], ref["xc"])
