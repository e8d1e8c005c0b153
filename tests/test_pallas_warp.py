"""Pallas warp kernel: interpret-mode correctness vs the gather reference
(forward, VJP w.r.t. source and disparity)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import uncertainty_model_tpu.ops.warp as warp_mod
from uncertainty_model_tpu.ops.pallas.warp import warp_rows


def _rand(*shape, seed=0, lo=0.0, hi=1.0):
    rng = np.random.default_rng(seed)
    return (rng.uniform(size=shape) * (hi - lo) + lo).astype(np.float32)


def _gather_rows(xsrc, srcv):
    """Reference row warp with the gather formulation."""
    r, c, w = srcv.shape
    x0 = jnp.floor(xsrc)
    t = xsrc - x0
    x0 = x0.astype(jnp.int32)

    def tap(idx):
        valid = ((idx >= 0) & (idx <= w - 1)).astype(srcv.dtype)
        idx_c = jnp.clip(idx, 0, w - 1)
        vals = jnp.take_along_axis(srcv, idx_c[:, None, :].repeat(c, 1), axis=2)
        return vals * valid[:, None, :]

    return tap(x0) * (1 - t)[:, None, :] + tap(x0 + 1) * t[:, None, :]


class TestPallasWarpRows:
    def _data(self, r=6, c=3, w=32, seed=0):
        xsrc = jnp.asarray(
            _rand(r, w, seed=seed, lo=-2.0, hi=w + 1.0)  # incl. out-of-range
        )
        srcv = jnp.asarray(_rand(r, c, w, seed=seed + 1))
        return xsrc, srcv

    def test_forward_matches_gather(self):
        xsrc, srcv = self._data()
        got = warp_rows(xsrc, srcv, True)  # interpret mode
        expected = _gather_rows(xsrc, srcv)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   atol=1e-5)

    def test_vjp_matches_gather(self):
        xsrc, srcv = self._data(seed=3)

        def loss_pallas(xsrc, srcv):
            return jnp.sum(warp_rows(xsrc, srcv, True) ** 2)

        def loss_gather(xsrc, srcv):
            return jnp.sum(_gather_rows(xsrc, srcv) ** 2)

        g_pallas = jax.grad(loss_pallas, argnums=(0, 1))(xsrc, srcv)
        g_gather = jax.grad(loss_gather, argnums=(0, 1))(xsrc, srcv)

        np.testing.assert_allclose(np.asarray(g_pallas[0]),
                                   np.asarray(g_gather[0]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(g_pallas[1]),
                                   np.asarray(g_gather[1]), atol=1e-4)

    def test_row_padding(self):
        # rows not a multiple of ROWS_PER_PROGRAM
        xsrc, srcv = self._data(r=5, seed=6)
        got = warp_rows(xsrc, srcv, True)
        expected = _gather_rows(xsrc, srcv)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   atol=1e-5)


class TestWarpBackendIntegration:
    def test_pallas_backend_matches_gather_backend(self, monkeypatch):
        disp = jnp.asarray(_rand(2, 8, 32, 1, seed=8, lo=0.0, hi=0.3))
        src = jnp.asarray(_rand(2, 8, 32, 3, seed=9))

        monkeypatch.setattr(warp_mod, "WARP_BACKEND", "gather")
        ref = warp_mod.warp_by_disparity(disp, src)

        monkeypatch.setattr(warp_mod, "WARP_BACKEND", "pallas")
        monkeypatch.setattr(warp_mod, "_use_pallas", lambda *a: True)
        import uncertainty_model_tpu.ops.pallas.warp as pw

        real = pw.warp_rows

        def interp(xsrc, srcv, interpret=False):
            return real(xsrc, srcv, True)

        monkeypatch.setattr(pw, "warp_rows", interp)
        got = warp_mod.warp_by_disparity(disp, src)

        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
