"""Space-to-depth (s2d) transform for stride-1 SAME convolutions.

Motivation (TPU): the encoder's early stages run 7x7/5x5 convs on wide
low-channel maps (C=32 at 128x256, reference model/layers/encoder.py:42,
config.yml:17-18).  C=32 tensors pad 3/4 of a 128-lane register tile and
XLA's conv emitters hit pathological tilings on them (measured: one of the
four identical stage-0 convs cost ~33x the others, docs/PERFORMANCE.md).
Re-expressing the conv on the 2x2 space-to-depth layout quadruples the
channel dims (32 -> 128: full lanes on both conv operands) at a modest MAC
overhead, after which the op is MXU-shaped.

Math: for a zero-pad SAME stride-1 conv with odd kernel k, pad p=(k-1)/2,

    y[2m+a, 2n+b, co] = sum_{u,v,ci} w[u,v,ci,co] * x[2m+a-p+u, 2n+b-p+v, ci]

substituting x[2q+c, 2t+d, ci] = X[q, t, (c,d,ci)] (the s2d input) gives a
stride-1 SAME conv on the s2d grid,

    Y[m, n, (a,b,co)] = sum_{R,S,(c,d,ci)} W'[R,S,(c,d,ci),(a,b,co)] * X[m+R-P, n+S-P, (c,d,ci)]

with  W'[R,S,(c,d,ci),(a,b,co)] = w[2(R-P)+c+p-a, 2(S-P)+d+p-b, ci, co]
(zero where the index falls outside [0,k)), kernel size k' = 2P+1,
P = (p+1)//2.  k=7 -> 5x5 at 16x the channel-pair count (2.04x MACs),
k=5 -> 3x3 (1.44x MACs).  The transform is exact: the s2d conv's SAME zero
padding covers the original conv's zero padding, and taps beyond it carry
zero weights.  (Verified bit-level up to f32 reassociation in
tests/test_ops.py.)
"""

from __future__ import annotations

import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/r, W/r, r*r*C); channel index (c, d, ci)
    phase-major: ((c*r + d) * C + ci)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // r, w // r, r * r * c)


def depth_to_space(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    b, h, w, c4 = x.shape
    c = c4 // (r * r)
    x = x.reshape(b, h, w, r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * r, w * r, c)


def s2d_conv_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Transform a (k, k, Cin, Cout) SAME stride-1 conv kernel into its
    (k', k', 4*Cin, 4*Cout) space-to-depth equivalent (r=2; see module
    docstring for the derivation and exactness argument)."""
    k, _, cin, cout = w.shape
    p = (k - 1) // 2
    big_p = (p + 1) // 2
    kp = 2 * big_p + 1

    # u[R, c, a] = 2*(R-P) + c + p - a   (same formula for columns v[S, d, b])
    grid_r = jnp.arange(kp)[:, None, None]
    grid_c = jnp.arange(2)[None, :, None]
    grid_a = jnp.arange(2)[None, None, :]
    u = 2 * (grid_r - big_p) + grid_c + p - grid_a  # (kp, 2, 2)
    valid = (u >= 0) & (u < k)
    uc = jnp.clip(u, 0, k - 1)

    w_u = jnp.where(valid[..., None, None, None], w[uc], 0)  # (kp,2,2, k,ci,co)
    w_uv = jnp.where(
        valid[None, None, None, ..., None, None], w_u[:, :, :, uc], 0
    )  # (kp, 2_c, 2_a, kp, 2_d, 2_b, ci, co)

    # -> (R, S, (c, d, ci), (a, b, co))
    w2 = jnp.transpose(w_uv, (0, 3, 1, 4, 6, 2, 5, 7))
    return w2.reshape(kp, kp, 4 * cin, 4 * cout)


def s2d_bias(bias: jnp.ndarray) -> jnp.ndarray:
    """Per-channel bias/scale vector -> its s2d (phase-major) counterpart."""
    return jnp.tile(bias, 4)


def s2d_out_stride2_conv_kernel(w: jnp.ndarray):
    """Transform a stride-2 SAME conv kernel (odd k, pad p=(k-1)//2) into the
    equivalent stride-4 conv producing the output directly in s2d form.

    For  y[2i+a, 2j+b, c] = sum_u,v w[u,v]·x[4i+2a-p+u, 4j+2b-p+v]  define a
    stride-4 kernel  W'[u',v',ci,(a,b,c)] = w[u'-2a, v'-2b, ci, c]  (zero
    outside [0,k)) with k' = k+2 and padding (p, p-1) per dim: the covered
    input span 4·(W/4-1)+k+2 = 2·(W/2-1)+k+1 matches the original conv's
    (2·(W/2-1)+k) plus one never-read trailing tap, and every x index the
    transformed conv reads equals the original's (same zero-pad positions) —
    the transform is an exact rearrangement.

    Returns ``(kernel (k+2, k+2, Cin, 4*Cout), stride=4, padding=(p, p-1))``.
    Eliminates the post-conv space_to_depth transpose of the stage-0 input
    conv on the serving s2d path.
    """
    k, _, cin, cout = w.shape
    p = (k - 1) // 2
    kp = k + 2

    grid_u = jnp.arange(kp)[:, None]
    grid_a = jnp.arange(2)[None, :]
    u = grid_u - 2 * grid_a  # (kp, 2)
    valid = (u >= 0) & (u < k)
    uc = jnp.clip(u, 0, k - 1)

    w_u = jnp.where(valid[..., None, None, None], w[uc], 0)  # (kp,2_a,k,ci,co)
    w_uv = jnp.where(valid[None, None, ..., None, None],
                     w_u[:, :, uc], 0)  # (kp, 2_a, kp, 2_b, ci, co)

    # -> (u', v', ci, (a, b, c)) phase-major output channels
    w2 = jnp.transpose(w_uv, (0, 2, 4, 1, 3, 5))
    return w2.reshape(kp, kp, cin, 4 * cout), 4, (p, p - 1)


def s2d_in_stride2_conv_kernel(w: jnp.ndarray):
    """Transform a stride-2 SAME conv kernel with EVEN pad p (k ≡ 1 mod 4,
    e.g. k=5) into the equivalent stride-1 conv CONSUMING s2d input and
    producing the native (non-s2d) output.

    y[o] = sum_u w[u]·x[2o-p+u]; with x[2r+q] = X[r,(q,·)] the taps become
    u = 2ρ+q+p over row offsets ρ, i.e. a stride-1 conv on the s2d grid with
    k' = p+1 taps per dim, pad p/2 (integral because p is even — the s2d
    grid's zero rows land exactly on the original pad rows, so the transform
    is exact).  Returns ``(kernel (k', k', 4*Cin, Cout), stride=1,
    padding=(p//2, p//2))``.

    Lets stage 1's input conv consume stage 0's s2d output directly — no
    depth_to_space between consecutive s2d encoder stages.
    """
    k, _, cin, cout = w.shape
    p = (k - 1) // 2
    assert p % 2 == 0, "s2d-input conv transform requires even pad (k=5, 9, ...)"
    kp = p + 1

    grid_r = jnp.arange(kp)[:, None]  # ρ + p//2 (shifted to start at 0)
    grid_q = jnp.arange(2)[None, :]
    u = 2 * (grid_r - p // 2) + grid_q + p  # (kp, 2)
    valid = (u >= 0) & (u < k)
    uc = jnp.clip(u, 0, k - 1)

    w_u = jnp.where(valid[..., None, None, None], w[uc], 0)  # (kp,2_q,k,ci,co)
    w_uv = jnp.where(valid[None, None, ..., None, None],
                     w_u[:, :, uc], 0)  # (kp, 2_q, kp, 2_d, ci, co)

    # -> (ρ, σ, (q, d, ci), co) phase-major input channels
    w2 = jnp.transpose(w_uv, (0, 2, 1, 3, 4, 5))
    return w2.reshape(kp, kp, 4 * cin, cout), 1, (p // 2, p // 2)


def block_diag_1x1_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(1,1,Cin,Cout) kernel -> its s2d block-diagonal form (1,1,4Cin,4Cout):
    a 1x1 conv acts per-pixel, so on the s2d tensor it applies independently
    to each of the 4 phase blocks (phase-major channel order)."""
    cin, cout = w.shape[2], w.shape[3]
    eye = jnp.eye(4, dtype=w.dtype)
    big = jnp.einsum("pq,io->piqo", eye, w[0, 0])
    return big.reshape(1, 1, 4 * cin, 4 * cout)
