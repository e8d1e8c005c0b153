"""Serving-optimised inference path.

The flax modules (models/) keep the reference's training semantics; this
module is the deployment counterpart: it rewrites a trained model into an
inference-only function with graph transforms that are invalid (or
unavailable) during training but exact at eval time:

* **BatchNorm folding** — eval-mode BN is a per-channel affine, so it is
  folded into the preceding conv's kernel/bias (reference eval semantics:
  model/layers/encoder.py:43 / decoder.py:79-84 with torch ``.eval()``).
* **Gate precomputation** — NodeBlock's sigmoid input gates
  (reference model/layers/encoder.py:115-123, incl. the ``mean_weight[0]``
  reuse quirk) are weights, not activations; they are materialised into a
  per-input gate vector at build time.
* **Space-to-depth execution** of the early encoder stages
  (``ops/s2d.py``): the interior 7x7 C=32 convs become 5x5 C=128 convs on
  the 2x2 s2d grid — full 128-lane tiles on both conv operands instead of
  3/4-padded ones, and it sidesteps XLA's pathological tiling of these
  shapes (docs/PERFORMANCE.md).
* **bfloat16 parameters** for the MXU (f32 softmax/statistic reductions
  are kept, matching the training modules' mixed-precision policy).

Everything is algebraically identical to
``model.apply(variables, x, train=False)``; tests/test_serving.py pins the
f32 path against the flax modules and golden tests pin those against the
PyTorch reference.
"""

from __future__ import annotations

import functools
import os
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .models.layers import _maybe_barrier, _reflect_conv
from .ops.pallas.conv import gated_conv_elu
from .ops import (
    depth_to_space,
    pad2d,
    pixel_shuffle,
    resize_bilinear,
    s2d_bias,
    s2d_conv_kernel,
    space_to_depth,
)
from .ops.s2d import (
    block_diag_1x1_kernel,
    s2d_in_stride2_conv_kernel,
    s2d_out_stride2_conv_kernel,
)
from .ops.pallas.decoder_fused import assemble, assemble_z, gate_z, se_squeeze

_DN = ("NHWC", "HWIO", "NHWC")
_BN_EPS = 1e-5


def _conv(x, kernel, bias, stride=1):
    """Zero-pad SAME conv (pad folded into the op).  The optimization
    barrier keeps XLA from fusing elementwise producers into the conv,
    which can demote it to a slow spatial emitter (models/layers.py,
    measured +8% end-to-end in round 1).  (An output-side barrier was also
    tried against the stage-0 window-config pathology: 934.9 fps vs 951 —
    no help, not kept.)"""
    k = kernel.shape[0]
    p = (k - 1) // 2
    y = lax.conv_general_dilated(
        _maybe_barrier(x), kernel, (stride, stride), [(p, p), (p, p)],
        dimension_numbers=_DN,
    )
    return y + bias


def _conv1x1(x, kernel, bias=None, pre=None):
    """1x1 conv via lax.conv (NOT einsum: the conv op keeps XLA's NHWC
    activation layouts; a matmul lowering relayouts the whole map).

    ``pre``: optional elementwise input hook (e.g. the folded SE gate
    scale).  When set, the input barrier is dropped so the hook has exactly
    one consumer and rides the conv's input fusion instead of
    materialising a full-tensor pass."""
    h = x if pre is None else pre(x)
    y = lax.conv_general_dilated(
        h if pre is not None else _maybe_barrier(h), kernel, (1, 1), "VALID",
        dimension_numbers=_DN
    )
    return y if bias is None else y + bias


def _rconv(x, kernel, bias, act=None, pre=None):
    """Reflect(1)-padded 3x3 conv: border-fixup lowering for real maps, the
    plain pad fallback for degenerate (<3 px) ones (same dispatch as
    models/layers.py ConvLayer).  ``act``/``pre``: elementwise output/input
    hooks fused per conv piece (see models/layers.py _reflect_conv)."""
    if x.shape[1] >= 3 and x.shape[2] >= 3:
        return _reflect_conv(x, kernel, bias, act=act, pre=pre)
    if pre is not None:
        x = pre(x)
    x = pad2d(x, (1, 1, 1, 1), mode="reflect")
    y = lax.conv_general_dilated(x, kernel, (1, 1), "VALID", dimension_numbers=_DN)
    y = y + bias
    return act(y) if act is not None else y


def _fold_bn(kernel, bias, bn_params, bn_stats):
    """conv -> eval BN  ==  conv with rescaled kernel/bias (exact)."""
    inv = bn_params["scale"] * lax.rsqrt(bn_stats["var"] + _BN_EPS)
    return kernel * inv, (bias - bn_stats["mean"]) * inv + bn_params["bias"]


def _softmax(v, axis):
    """f32-reduction softmax over possibly-bf16 data (same policy as
    models/layers.py EfficientAttention).  The max runs in the input dtype
    (max is exact in any dtype — no f32 conversion pass); only the large
    token-axis SUM accumulates in f32."""
    if v.dtype == jnp.float32:
        return jax.nn.softmax(v, axis=axis)
    m = jnp.max(v, axis=axis, keepdims=True)
    e = jnp.exp(v - m)
    s = jnp.sum(e, axis=axis, keepdims=True, dtype=jnp.float32)
    return e * (1.0 / s).astype(v.dtype)


class _StageSpec(NamedTuple):
    graph: Any  # GraphSpec
    heads: int
    s2d: bool
    s2d_in: bool = False   # stage input arrives in s2d form
    channels: int = 0      # original (non-s2d) out_channels
    conv_backend: str = "pallas"  # interior conv impl: pallas | lax
    attn_native: bool = False  # s2d stage: depth_to_space before attention
    smax: str = "nomax"  # grouped softmax: nomax | window | slice


# ---------------------------------------------------------------------------
# Build: variables -> folded serving params (+ static spec)
# ---------------------------------------------------------------------------


def _node_gates(node, mean_weight, parity_weight_indexing=True):
    """Per-input gate vector (reference encoder.py:115-123: gates[0] gates
    both the first and second input; the last weight is unused)."""
    g = jax.nn.sigmoid(mean_weight)
    n = len(node.inputs)
    if parity_weight_indexing:
        idx = [0] + list(range(n - 1))
    else:
        idx = list(range(n))
    return jnp.stack([g[i] for i in idx])


def build_serving_params(model, variables, s2d_stages=(0, 1), dtype=jnp.bfloat16,
                         s2d_conv_backend="pallas", fused_stages=(2, 3, 4),
                         s2d_attention="s2d", decoder_backend="fused",
                         dec_pipeline=None, dec_fold=None, elu_fold=None,
                         smax=None):
    """Fold a trained model's variables into the serving parameter tree.

    Returns ``(specs, params)``: ``specs`` is static (closed over by the
    apply fn), ``params`` is a pytree of arrays (jit operand).

    s2d stages run ENTIRELY in the space-to-depth domain — the input conv
    produces s2d output directly (``s2d_out_stride2_conv_kernel``), the
    attention runs on s2d tensors (block-diagonal 1x1 kernels, phase-summed
    context), and consecutive s2d stages hand the tensor over without a
    depth_to_space (``s2d_in_stride2_conv_kernel``).  All transforms are
    exact build-time kernel rearrangements (ops/s2d.py docstrings carry the
    derivations); round 2 paid ~14 ms/pass in s2d<->native conversions and
    relayouts around every stage boundary.

    ``s2d_attention``: "s2d" keeps the attention in the s2d domain (block-
    diagonal kernels, phase-summed context — zero conversions, but the
    cross-phase softmax reductions double the pool cost); "native" converts
    the graph output with one depth_to_space and runs the untransformed
    attention (the stage then returns a native tensor, so a following s2d
    stage pays its own input transform).

    ``decoder_backend``: "fused" (the production Pallas-glue decoder) is
    the only backend.  A channel-major fully-fused chain ("cmajor") was
    built and measured in rounds 3-4: stage-4 kernels compiled but were no
    faster (34.95 ms vs the fused path's chain) and the stage-3 tail failed
    to compile on real TPU (Mosaic HTTP 500) — deleted in round 5; the
    writeup survives in docs/PERFORMANCE.md.

    ``dec_pipeline`` ("gate_z" | "gate_fold" | "squeeze_first"),
    ``dec_fold`` (in-kernel SE fm fold where cf <= 8), ``elu_fold`` (iconv
    ELU folded into its consumers' conv pieces) and ``smax`` ("slice" |
    "window", grouped-softmax reductions) are resolved HERE, at build
    time, from the UMT_DEC_PIPELINE / UMT_DEC_FOLD / UMT_ELU_FOLD /
    UMT_SMAX environment defaults — flipping the env after the first
    compile has no effect and the built pipeline is inspectable in the
    returned specs (advisor round-4 finding).  See
    _decoder_stage_apply_fused for what each pipeline does.
    """
    if dec_pipeline is None:
        # round-5 interleaved ladder (tools/ladder_r5.py, reps 7): gate_z
        # 123.84 ms / 1033.6 fps, gate_fold 117.93 / 1085.4, gate_fold +
        # elu_fold 118.93 / 1076.3 — gate_fold wins by 4.8% (spread ~1%),
        # elu_fold on top is neutral-to-negative and stays off.
        dec_pipeline = os.environ.get("UMT_DEC_PIPELINE", "gate_fold")
    if dec_fold is None:
        dec_fold = os.environ.get("UMT_DEC_FOLD", "1") != "0"
    if elu_fold is None:
        elu_fold = os.environ.get("UMT_ELU_FOLD", "0") != "0"
    if smax is None:
        # round-5 interleaved ladders: slice 118.42 ms / 1080.9 fps ->
        # window 113.46 / 1128.1 (reduce_window beats the round-4 slice
        # trees, agreeing with the isolation probe) -> nomax 103.65 /
        # 1235.0 (+9.5%, spread ~1.5%): dropping the max subtraction lets
        # exp ride the projection convs' output fusions and turns the
        # group sums into an MXU indicator conv.
        smax = os.environ.get("UMT_SMAX", "nomax")
    if smax not in ("slice", "window", "nomax"):
        raise ValueError(f"unknown smax {smax!r}")
    if dec_pipeline not in ("gate_z", "gate_fold", "squeeze_first"):
        raise ValueError(f"unknown dec_pipeline {dec_pipeline!r}")
    p, s = variables["params"], variables["batch_stats"]

    enc_specs, enc_params = [], []
    prev_s2d = False
    for i, (graph, (out_ch, kernel, heads)) in enumerate(
        zip(model.encoder.graphs, model.encoder.layers)
    ):
        sp, ss = p["encoder"][f"stage_{i}"], s["encoder"][f"stage_{i}"]
        use_s2d = (i in s2d_stages) and kernel >= 5
        # consuming s2d input needs an even-pad input conv (k=5, 9, ...)
        s2d_in = prev_s2d and (((kernel - 1) // 2) % 2 == 0)
        nodes = {}
        for node in graph.nodes:
            np_ = sp["graph"][f"node_{node.id}"]
            ns = ss["graph"][f"node_{node.id}"]
            k, b = _fold_bn(
                np_["conv_block"]["conv"]["kernel"],
                np_["conv_block"]["conv"]["bias"],
                np_["conv_block"]["bn"],
                ns["conv_block"]["bn"],
            )
            entry = {}
            if node.node_type == "input":
                if use_s2d and not s2d_in:
                    # native input -> s2d output in ONE stride-4 conv
                    k, _, _ = s2d_out_stride2_conv_kernel(k)
                    b = s2d_bias(b)
                elif s2d_in:
                    # s2d input -> native output, stride-1 on the s2d grid
                    k, _, _ = s2d_in_stride2_conv_kernel(k)
            elif use_s2d:
                k, b = s2d_conv_kernel(k), s2d_bias(b)
            entry["kernel"], entry["bias"] = k, b
            if len(node.inputs) > 1:
                entry["gates"] = _node_gates(node, np_["mean_weight"])
            nodes[str(node.id)] = entry

        attn = sp["attention"]
        attn_native = use_s2d and s2d_attention == "native"
        if use_s2d and not attn_native:
            attn = {
                name: {"kernel": block_diag_1x1_kernel(attn[name]["kernel"]),
                       "bias": s2d_bias(attn[name]["bias"])}
                for name in ("keys", "queries", "values", "reprojection")
            }
        enc_specs.append(_StageSpec(graph=graph, heads=heads, s2d=use_s2d,
                                    s2d_in=s2d_in, channels=out_ch,
                                    conv_backend=s2d_conv_backend,
                                    attn_native=attn_native, smax=smax))
        enc_params.append({"nodes": nodes, "attention": attn})
        prev_s2d = use_s2d and not attn_native

    dec_specs, dec_params = [], []
    prev_fused_ccat = None
    prev_disp_ch = 0
    for i, frozen in enumerate(model.decoder.layers):
        cfg = dict(frozen)
        sp = p["decoder"][f"stage_{i}"]
        ss = s["decoder"][f"stage_{i}"]
        stage = {}
        for name in ("se_conv", "upsample_conv", "iconv"):
            conv = sp[name]["conv_layer"]["conv"]
            k, b = conv["kernel"], conv["bias"]
            if name == "se_conv" or cfg.get("batch_norm", True):
                k, b = _fold_bn(k, b, sp[name]["bn"], ss[name]["bn"])
            stage[name] = {"kernel": k, "bias": b}

        # fused-glue decoder stages (ops/pallas/decoder_fused.py): one
        # Pallas pass assembles [z | pixel_shuffle(elu(xc)) | up2(disp)]
        # and the SE sums; the convs stay XLA.  All layout shuffles become
        # build-time kernel permutations (values identical, pinned by
        # tests/test_serving.py):
        #   - upsample_conv output channels -> phase-major (in-kernel
        #     pixel shuffle = slice + column interleave)
        #   - iconv input channels -> the [z, xup, disp] concat order
        #   - when the PREVIOUS stage is fused, its full cat tensor is this
        #     stage's skip handle: the se_conv skip half is zero-embedded to
        #     cat's channel count (z sits first, so rows [0, cso_prev))
        if decoder_backend != "fused":
            raise ValueError(f"unknown decoder_backend {decoder_backend!r} "
                             "(the cmajor experiment was removed in round 5)")
        eligible = i in fused_stages and cfg.get("scale", 2) == 2
        cfg["fused"] = eligible
        if cfg["fused"]:
            cfg["pipeline"] = dec_pipeline
            cfg["fold"] = dec_fold and cfg["feature_in_channels"] <= 8
            cfg["elu_fold"] = elu_fold
        cfg["disp_in_ch"] = (prev_disp_ch if cfg.get("concat_disp", True)
                             else 0)
        if cfg["fused"]:
            cu = cfg["upsample_channels"]
            cso = cfg["skip_out_channels"]
            cf = cfg["feature_in_channels"]
            ku, bu = stage["upsample_conv"]["kernel"], stage["upsample_conv"]["bias"]
            perm = jnp.asarray(
                [c * 4 + pph for pph in range(4) for c in range(cu)])
            stage["upsample_conv"] = {"kernel": ku[..., perm], "bias": bu[perm]}

            ki = stage["iconv"]["kernel"]
            has_disp = cfg.get("concat_disp", True)
            ki_perm = jnp.concatenate(
                [ki[:, :, cu:cu + cso], ki[:, :, 0:cu], ki[:, :, cu + cso:]],
                axis=2)
            stage["iconv"] = {"kernel": ki_perm, "bias": stage["iconv"]["bias"]}

            se_old = stage.pop("se_conv")
            stage["se_fm"] = {"kernel": se_old["kernel"][:, :, :cf]}
            kskip = se_old["kernel"][:, :, cf:]
            if prev_fused_ccat is not None:
                kskip = jnp.concatenate(
                    [kskip, jnp.zeros((1, 1, prev_fused_ccat - kskip.shape[2],
                                       cso), kskip.dtype)], axis=2)
            stage["se_skip"] = {"kernel": kskip}
            stage["se_bias"] = se_old["bias"]
            disp_in = prev_disp_ch if has_disp else 0
            prev_fused_ccat = cso + cu + disp_in
        else:
            prev_fused_ccat = None
        prev_disp_ch = (cfg.get("disp_channels", 4)
                        if cfg.get("calculate_disp", True) else 0)
        if cfg.get("fc", True):
            # fc variant: two bias-free Dense layers (models/layers.py SELayer)
            stage["se"] = {"fc1": sp["se"]["fc1"]["kernel"],
                           "fc2": sp["se"]["fc2"]["kernel"]}
        else:
            # conv variant (reference model/layers/decoder.py:111-136 with
            # fc=False): 1x1 convs with bias — squeeze the (1,1,in,out)
            # kernels to (in, out) so _se_apply's matmul form covers both
            stage["se"] = {"fc1": sp["se"]["conv1"]["kernel"][0, 0],
                           "b1": sp["se"]["conv1"]["bias"],
                           "fc2": sp["se"]["conv2"]["kernel"][0, 0],
                           "b2": sp["se"]["conv2"]["bias"]}
        if cfg.get("calculate_disp", True):
            stage["disp"] = {"kernel": sp["disp"]["conv"]["kernel"],
                             "bias": sp["disp"]["conv"]["bias"]}
        dec_specs.append(cfg)
        dec_params.append(stage)

    # an elu_fold stage hands its successor a PRE-ELU ``out``; the consumer
    # applies the ELU inside its upsample conv's input fusion
    for i in range(1, len(dec_specs)):
        dec_specs[i]["x_needs_elu"] = bool(
            dec_specs[i - 1].get("fused") and
            dec_specs[i - 1].get("elu_fold"))

    params = {"encoder": enc_params, "decoder": dec_params}
    if dtype is not None:
        params = jax.tree.map(lambda a: a.astype(dtype), params)
    return (tuple(enc_specs), tuple(dec_specs)), params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _grouped_softmax_unnorm(v, group, formulation="nomax"):
    """Grouped softmax split into ``(e, inv)`` with the normalization NOT
    applied: ``softmax == e * repeat(inv, group)``.  Channel-window
    reduce_windows instead of a 5-D head-split reshape (a head split
    relayouts the whole map — minor dim 4 pads 128 lanes 32x; measured
    ~3 ms/stage on the batch-128 trace).

    Callers fold ``inv`` past the attended contraction (the context matrix
    is block-diagonal by head, so every output channel of head g shares
    divisor s[..., g]) — the normalized query map is never materialised:
    round-3 traces put the separate ``e * inv`` pass at ~1.3 ms at enc0/1
    shapes.

    On the bf16 serving path the window reductions stay in bf16: the max is
    EXACT in any dtype, and a ``group``-element (4-8 values) bf16 sum's
    rounding (~2^-9 relative per add) sits far below the path's own bf16
    quantization of v; only the reciprocal is computed in f32.  The f32
    parity path keeps full f32 reductions (tree order — reduce_window's
    reduction order is unspecified anyway and tests pin rtol).

    Round 4 switched the reduce_windows to strided-slice max/sum trees
    hoping to fix budget finding 6 (window reductions 5 ms vs ~1 floor
    across enc0/enc1); the round-5 chip probe (tools/probe_gated_sum.py,
    smax family) measured the slice trees WORSE in isolation — strided
    channel slices walk a non-minor dim — so the formulation is a
    build-time choice (``smax``: "window" | "slice" | "nomax", UMT_SMAX)
    and the default follows the round-5 end-to-end ladder.

    "nomax" drops the max subtraction entirely: softmax(v) ==
    exp(v)/sum(exp(v)) exactly, and the subtraction exists only to bound
    exp's argument — but bfloat16 has float32's full exponent range, so
    exp(v) is range-safe for |v| < 88 (conv outputs here are O(10)), and
    the relative rounding of exp/sum is magnitude-independent in both
    dtypes.  The payoff: ``exp(v)`` is a pure elementwise op that rides
    the queries conv's OUTPUT fusion (the max formulations force v to
    materialise), and the group sums become a tiny 0/1-indicator 1x1 conv
    on the MXU — both reduce_window passes disappear."""
    if formulation == "nomax":
        e = jnp.exp(v)
        c = v.shape[-1]
        heads = c // group
        ind = jnp.asarray(
            (jnp.arange(c)[:, None] // group) == jnp.arange(heads)[None, :],
            v.dtype).reshape(1, 1, c, heads)
        s = lax.conv_general_dilated(e, ind, (1, 1), "VALID",
                                     dimension_numbers=_DN)
        if v.dtype == jnp.float32:
            return e, 1.0 / s
        return e, (1.0 / s.astype(jnp.float32)).astype(v.dtype)
    if formulation == "window":
        neg_inf = jnp.asarray(-jnp.inf, v.dtype)
        m = lax.reduce_window(v, neg_inf, lax.max,
                              (1, 1, 1, group), (1, 1, 1, group), "VALID")
        e = jnp.exp(v - jnp.repeat(m, group, axis=-1))
        s = lax.reduce_window(e, jnp.asarray(0.0, v.dtype), lax.add,
                              (1, 1, 1, group), (1, 1, 1, group), "VALID")
    else:
        cols = [v[..., g::group] for g in range(group)]  # elt g of each group
        m = functools.reduce(jnp.maximum, cols)
        e = jnp.exp(v - jnp.repeat(m, group, axis=-1))
        s = functools.reduce(jnp.add, [e[..., g::group] for g in range(group)])
    if v.dtype == jnp.float32:
        return e, 1.0 / s
    return e, (1.0 / s.astype(jnp.float32)).astype(v.dtype)


def _attention_apply(prm, heads, x, smax="nomax"):
    """EfficientAttention (reference model/layers/attention.py) on folded
    params.

    Head blocking is expressed as a block-diagonal mask on the FULL (c x c)
    context matrix instead of a 5-D head-split reshape: the extra masked
    FLOPs are trivial (the context matmuls are tiny next to the convs) and
    the activation map never leaves its conv layout.  Identical math: the
    mask zeroes exactly the cross-head context terms.

    Both softmax normalizations are folded PAST their contractions (same
    values, reassociated): the keys normalizer 1/s is per (batch, k), so it
    scales the tiny context matrix instead of the full key map; the queries
    normalizer is per (batch, pixel, head) — the context is block-diagonal
    by head, so every attended channel of head g shares it and it rides the
    attended map's einsum epilogue.  Neither normalized map is
    materialised (the separate e*inv passes cost ~1.3 ms/stage at enc0/1
    batch-128 shapes, round-4 budget).
    """
    b, h, w, c = x.shape

    def proj(name):
        return _conv1x1(x, prm[name]["kernel"], prm[name]["bias"])

    # keys softmax over tokens (reference attention.py softmax over (2,3)):
    # max in input dtype (exact), token sum in f32 (same policy as
    # _softmax), normalizer deferred to the contracted context
    kp = proj("keys")
    if smax == "nomax":
        ke = jnp.exp(kp)   # rides the keys conv's output fusion; see
        # _grouped_softmax_unnorm for why dropping the max is safe here
    else:
        km = jnp.max(kp, axis=(1, 2), keepdims=True)
        ke = jnp.exp(kp - km)
    ks = jnp.sum(ke, axis=(1, 2), dtype=jnp.float32)           # (B, C)

    qe, qinv = _grouped_softmax_unnorm(proj("queries"), c // heads,
                                       formulation=smax)
    values = proj("values")

    context = jnp.einsum("bxyk,bxyv->bkv", ke, values)
    context = context * (1.0 / ks)[..., None].astype(context.dtype)
    block = c // heads
    mask = jnp.asarray(
        (jnp.arange(c)[:, None] // block) == (jnp.arange(c)[None, :] // block),
        context.dtype,
    )
    attended = jnp.einsum("bkv,bxyk->bxyv", context * mask, qe)
    attended = attended * jnp.repeat(qinv, block, axis=-1)

    out = _conv1x1(attended, prm["reprojection"]["kernel"],
                   prm["reprojection"]["bias"])
    return out + x


def _softmax_tokens_s2d(v, c):
    """Per-ORIGINAL-channel softmax over all spatial tokens, computed on the
    s2d tensor: channel (p, c)'s tokens live in 4 phase blocks, so the max /
    sum reductions combine the per-s2d-channel reductions across phases.
    Identical math to ``_softmax(v_native, axis=(1, 2))``."""
    b = v.shape[0]
    m4 = jnp.max(v.astype(jnp.float32), axis=(1, 2))          # (B, 4C)
    m = jnp.max(m4.reshape(b, 4, c), axis=1)                   # (B, C)
    mt = jnp.tile(m, (1, 4))[:, None, None, :]                 # (B,1,1,4C)
    e = jnp.exp(v - mt.astype(v.dtype))
    s4 = jnp.sum(e.astype(jnp.float32), axis=(1, 2))           # (B, 4C)
    st = jnp.tile(jnp.sum(s4.reshape(b, 4, c), axis=1), (1, 4))
    return e * (1.0 / st)[:, None, None, :].astype(v.dtype)


def _attention_s2d(prm, heads, c, x, smax="nomax"):
    """EfficientAttention computed entirely in the s2d domain (kernels are
    pre-transformed to block-diagonal form at build time).

    The context matrix over original channels is the sum of the 4
    phase-diagonal blocks of the s2d context: K[x,y,k]·V[x,y,v] summed over
    native tokens equals sum_p K_s2d[i,j,(p,k)]·V_s2d[i,j,(p,v)] — cross-
    phase blocks pair DIFFERENT native tokens and are discarded.  Applying
    the (head-masked) context to the queries is per-pixel linear, i.e.
    block-diagonal again.  Values identical to ``_attention_apply`` on the
    depth_to_space'd tensor (tests/test_serving.py pins the f32 path)."""
    b = x.shape[0]

    def proj(name):
        return _conv1x1(x, prm[name]["kernel"], prm[name]["bias"])

    keys = _softmax_tokens_s2d(proj("keys"), c)
    # the (phase, head) block structure of ``big`` matches the channel
    # groups exactly (output s2d channel u = p*c+v is in group
    # u // (c//heads) = p*heads + head(v)), so the queries normalizer
    # folds past the attended contraction just as in _attention_apply
    qe, qinv = _grouped_softmax_unnorm(proj("queries"), c // heads,
                                       formulation=smax)
    values = proj("values")

    full = jnp.einsum("bxyu,bxyw->buw", keys, values)          # (B, 4C, 4C)
    r = full.reshape(b, 4, c, 4, c)
    context = r[:, 0, :, 0, :] + r[:, 1, :, 1, :] + r[:, 2, :, 2, :] + r[:, 3, :, 3, :]

    block = c // heads
    mask = jnp.asarray(
        (jnp.arange(c)[:, None] // block) == (jnp.arange(c)[None, :] // block),
        context.dtype,
    )
    big = jnp.einsum("pq,bkv->bpkqv", jnp.eye(4, dtype=context.dtype),
                     context * mask).reshape(b, 4 * c, 4 * c)
    attended = jnp.einsum("buw,bxyu->bxyw", big, qe)
    attended = attended * jnp.repeat(qinv, c // heads, axis=-1)

    out = _conv1x1(attended, prm["reprojection"]["kernel"],
                   prm["reprojection"]["bias"])
    return out + x


def _encoder_stage_apply(prm, spec: _StageSpec, x):
    """One encoder stage; ``x`` is s2d iff ``spec.s2d_in``; the result is
    s2d iff ``spec.s2d``."""
    graph = spec.graph

    if spec.s2d:
        # s2d-domain stage: interiors run as Pallas implicit-GEMM kernels
        # (ops/pallas/conv.py) with the sigmoid gating folded in (no HBM
        # round trip for the gated sum), or as lax convs on the s2d kernels
        # (conv_backend="lax").  Node outputs are padded ONCE and shared by
        # every downstream consumer.
        interior = next(n for n in graph.nodes if n.node_type != "input")
        k = prm["nodes"][str(interior.id)]["kernel"].shape[0]
        p = (k - 1) // 2
        one = jnp.ones((1,), jnp.float32)
        pad = None  # set once the s2d width is known

        raw, padded = {}, {}
        for nid in graph.in_nodes:
            node_p = prm["nodes"][str(nid)]
            if spec.s2d_in:
                # stride-1 conv on the s2d grid -> native, then re-s2d
                kin = node_p["kernel"].shape[0]
                y = lax.conv_general_dilated(
                    _maybe_barrier(x), node_p["kernel"], (1, 1),
                    [((kin - 1) // 2,) * 2] * 2, dimension_numbers=_DN,
                ) + node_p["bias"]
                y = space_to_depth(jax.nn.elu(y))
            else:
                # native input -> s2d output in one stride-4 conv
                kin = node_p["kernel"].shape[0]
                pin = (kin - 3) // 2  # original pad p = (k'-2-1)//2
                y = lax.conv_general_dilated(
                    _maybe_barrier(x), node_p["kernel"], (4, 4),
                    [(pin, pin - 1), (pin, pin - 1)], dimension_numbers=_DN,
                ) + node_p["bias"]
                y = jax.nn.elu(y)
            if pad is None:
                # right-pad W so the padded sublane extent is 8-aligned
                # (Mosaic DMA-slice requirement, ops/pallas/conv.py)
                wp = y.shape[2] + 2 * p
                extra = (-wp) % 8
                pad = ((0, 0), (p, p), (p, p + extra), (0, 0))
                width = y.shape[2]
            raw[nid] = y
            padded[nid] = jnp.pad(y, pad)

        for node in graph.nodes:
            if node.id in raw:
                continue
            node_p = prm["nodes"][str(node.id)]
            xs = [padded[j] for j in node.inputs]
            if not all(a.shape == xs[0].shape for a in xs):
                raise ValueError(
                    "serving s2d path: unequal node resolutions at node "
                    f"{node.id} ({[a.shape for a in xs]}). Structurally "
                    "unreachable for stages built from stride-2 input nodes "
                    "+ stride-1 interiors (every WS/K5 graph); the flax "
                    "training path (models/layers.py NodeBlock) carries the "
                    "reference's resize alignment if you build such a stage.")
            gates = node_p.get("gates", one)
            if spec.conv_backend == "pallas":
                y = gated_conv_elu(xs, gates, node_p["kernel"],
                                   node_p["bias"], width=width)
            else:
                g = gates.astype(xs[0].dtype)
                h = g[0] * xs[0]
                for gi in range(1, len(xs)):
                    h = h + g[gi] * xs[gi]
                y = jax.nn.elu(lax.conv_general_dilated(
                    _maybe_barrier(h[:, :, :width + 2 * p]), node_p["kernel"],
                    (1, 1), "VALID", dimension_numbers=_DN,
                ) + node_p["bias"])
            raw[node.id] = y
            if any(node.id in n.inputs for n in graph.nodes):
                padded[node.id] = jnp.pad(y, pad)

        out = None
        for nid in graph.out_nodes:
            out = raw[nid] if out is None else out + raw[nid]
        out = out / len(graph.out_nodes)
        if spec.attn_native:
            return _attention_apply(prm["attention"], spec.heads,
                                    depth_to_space(out), smax=spec.smax)
        return _attention_s2d(prm["attention"], spec.heads, spec.channels,
                              out, smax=spec.smax)

    results = {}
    for nid in graph.in_nodes:
        node_p = prm["nodes"][str(nid)]
        if spec.s2d_in:
            kin = node_p["kernel"].shape[0]
            y = lax.conv_general_dilated(
                _maybe_barrier(x), node_p["kernel"], (1, 1),
                [((kin - 1) // 2,) * 2] * 2, dimension_numbers=_DN,
            ) + node_p["bias"]
            results[nid] = jax.nn.elu(y)
        else:
            results[nid] = jax.nn.elu(
                _conv(x, node_p["kernel"], node_p["bias"], stride=2))

    for node in graph.nodes:
        if node.id in results:
            continue
        node_p = prm["nodes"][str(node.id)]
        inputs = [results[j] for j in node.inputs]
        if len(inputs) > 1:
            gates = node_p["gates"]
            for inp in inputs[1:]:
                if inp.shape != inputs[0].shape:
                    raise ValueError(
                        "serving path: unequal node resolutions at node "
                        f"{node.id} ({inp.shape} vs {inputs[0].shape}). "
                        "Structurally unreachable for stages built from "
                        "stride-2 input nodes + stride-1 interiors (every "
                        "WS/K5 graph); use the flax path for exotic stages "
                        "(it carries the reference's resize alignment, "
                        "encoder.py:92-113).")
            # XLA emits this chain as ONE fusion reading the k maps and
            # writing one (verified in the optimized HLO); a Pallas
            # one-pass kernel was built and measured SLOWER on chip
            # (enc0-k4 batch 128: 3.02 ms vs 2.73 xla; enc1-k3 within
            # noise) — deleted in round 5, see docs/PERFORMANCE.md.
            h = gates[0] * inputs[0]
            for gi, inp in enumerate(inputs[1:], start=1):
                h = h + gates[gi] * inp
        else:
            h = inputs[0]
        results[node.id] = jax.nn.elu(
            _conv(h, node_p["kernel"], node_p["bias"]))

    out = None
    for nid in graph.out_nodes:
        out = results[nid] if out is None else out + results[nid]
    out = out / len(graph.out_nodes)
    return _attention_apply(prm["attention"], spec.heads, out,
                            smax=spec.smax)


def _se_apply(prm, x):
    """SELayer on folded params — fc variant (bias-free) and conv variant
    (1x1 convs squeezed to matmuls, with bias) share one matmul form."""
    squeezed = jnp.mean(x, axis=(1, 2), dtype=jnp.float32).astype(x.dtype)
    s = squeezed @ prm["fc1"]
    if "b1" in prm:
        s = s + prm["b1"]
    s = jax.nn.relu(s)
    s = s @ prm["fc2"]
    if "b2" in prm:
        s = s + prm["b2"]
    s = jax.nn.sigmoid(s)
    return x * s[:, None, None, :]


def _se_gates(prm, squeezed, dt):
    """The SE MLP (fc and conv variants) on a precomputed f32 squeeze."""
    s = squeezed.astype(dt) @ prm["fc1"]
    if "b1" in prm:
        s = s + prm["b1"]
    s = jax.nn.relu(s)
    s = s @ prm["fc2"]
    if "b2" in prm:
        s = s + prm["b2"]
    return jax.nn.sigmoid(s)


def _decoder_stage_apply_fused(prm, cfg, x, feature_map, skip, disparity,
                               disp_scale):
    """Fused-glue decoder stage (ops/pallas/decoder_fused.py).

    ``skip`` is ``(tensor, scale_or_None)``: either a plain skip tensor or
    the previous fused stage's full cat tensor (whose z channels
    [0, cso_prev) are that skip — the se_skip kernel was zero-embedded at
    build time accordingly), plus, under the previous stage's gate_fold
    pipeline, the per-(batch, channel) gate scale that was never applied to
    the stored tensor.  Returns ``(out, (cat, scale), disp)``: ``cat``
    doubles as this stage's skip handle for a fused successor.  ``x``
    arrives PRE-ELU when the previous stage ran elu_fold (cfg
    "x_needs_elu"); ``out`` is returned pre-ELU when cfg "elu_fold" is set.
    Values identical to ``_decoder_stage_apply`` (tests/test_serving.py).

    Pipelines (build-time ``dec_pipeline``, default "gate_fold"):
      gate_z         assemble_z (ungated, + SE sums) -> SE MLP -> gate_z
                     in-place rewrite (the round-3 pipeline).
      gate_fold      assemble_z -> SE MLP -> the gate scale rides the
                     consumers' conv-INPUT fusions (iconv here, the
                     successor's se_skip 1x1): the z block is never
                     re-written and the gate_z pass disappears.  Exact:
                     conv(g*x) with g per-(batch, channel).
      squeeze_first  se_squeeze -> SE MLP -> gated assemble: the cat tensor
                     is written ONCE, already gated.  The assemble-family
                     kernels are VPU-bound, so recomputing the lerp+ELU
                     chain cost MORE than gate_z's extra bytes: measured
                     936.9 fps vs 997 (round 4).
    ``elu_fold``: the iconv's output ELU is applied per conv PIECE of its
    consumers (the disp head here, the successor's upsample conv) instead
    of as a standalone full-tensor pass — exact, because elementwise ops
    commute with the border-fixup DUS writes (models/layers.py
    _reflect_conv).
    Where the stage feature map has <= 8 channels (the full-res stage sees
    the 3-channel input image), the SE conv's fm half is folded into the
    kernels (k_fm, cfg "fold") and the 1 GB se_fm tensor never exists in
    HBM.
    """
    cso = cfg["skip_out_channels"]
    pipeline = cfg.get("pipeline", "gate_z")
    skip_t, skip_scale = skip if isinstance(skip, tuple) else (skip, None)
    skip_pre = (None if skip_scale is None
                else (lambda t: t * skip_scale.astype(t.dtype)))
    skip_feat_h = _conv1x1(skip_t, prm["se_skip"]["kernel"], pre=skip_pre)
    kfm = prm["se_fm"]["kernel"]  # (1, 1, cf, cso)
    fold = cfg.get("fold", kfm.shape[2] <= 8)
    x_pre = jax.nn.elu if cfg.get("x_needs_elu") else None
    xc = _rconv(x, prm["upsample_conv"]["kernel"],
                prm["upsample_conv"]["bias"], pre=x_pre)

    dh = disparity if cfg.get("concat_disp", True) else None
    if fold:
        se_in, k2 = feature_map, kfm[0, 0]
    else:
        se_in, k2 = _conv1x1(feature_map, kfm), None
    gscale = None
    if pipeline == "squeeze_first":
        mean = se_squeeze(se_in, skip_feat_h, prm["se_bias"], k_fm=k2)
        gates = _se_gates(prm["se"], mean, skip_feat_h.dtype)
        cat = assemble(se_in, skip_feat_h, gates, xc, dh, prm["se_bias"],
                       k_fm=k2)
    else:
        cat, mean = assemble_z(se_in, skip_feat_h, xc, dh, prm["se_bias"],
                               k_fm=k2)
        gates = _se_gates(prm["se"], mean, skip_feat_h.dtype)
        if pipeline == "gate_fold":
            ones = jnp.ones((gates.shape[0], cat.shape[-1] - cso),
                            gates.dtype)
            gscale = jnp.concatenate([gates, ones], axis=-1)[:, None, None]
        else:
            cat = gate_z(cat, gates, cso)

    cat_pre = (None if gscale is None
               else (lambda t: t * gscale.astype(t.dtype)))
    elu_fold = cfg.get("elu_fold", False)
    out = _rconv(cat, prm["iconv"]["kernel"], prm["iconv"]["bias"],
                 act=None if elu_fold else jax.nn.elu, pre=cat_pre)
    disp = None
    if cfg.get("calculate_disp", True):
        disp = _rconv(out, prm["disp"]["kernel"], prm["disp"]["bias"],
                      act=lambda y: disp_scale * jax.nn.sigmoid(y),
                      pre=jax.nn.elu if elu_fold else None)
    return out, (cat, gscale), disp


def _decoder_stage_apply(prm, cfg, x, feature_map, skip, disparity, disp_scale):
    r = cfg.get("scale", 2)

    # se_conv, split over (feature_map, skip) with the skip part hoisted
    # BELOW the 2x upsample: a 1x1 conv and a bilinear resize are both
    # linear, so conv(resize(skip)) == resize(conv(skip)) — the conv runs at
    # 1/4 the pixels and, since skip_in > skip_out channels everywhere in
    # the production config, the upsample moves ~half the bytes.
    k, b = prm["se_conv"]["kernel"], prm["se_conv"]["bias"]
    cf = feature_map.shape[-1]
    skip_feat = _conv1x1(skip, k[:, :, cf:])
    skip_feat = resize_bilinear(
        skip_feat, (skip.shape[1] * r, skip.shape[2] * r))
    se = _conv1x1(feature_map, k[:, :, :cf]) + skip_feat + b
    skip_out = _se_apply(prm["se"], jax.nn.elu(se))

    x_up = jax.nn.elu(
        _rconv(x, prm["upsample_conv"]["kernel"], prm["upsample_conv"]["bias"])
    )
    x_up = pixel_shuffle(x_up, r)

    parts = [x_up, skip_out]
    if cfg.get("concat_disp", True):
        parts.append(
            resize_bilinear(disparity, (disparity.shape[1] * r, disparity.shape[2] * r))
        )
    out = jax.nn.elu(
        _rconv(jnp.concatenate(parts, axis=-1),
               prm["iconv"]["kernel"], prm["iconv"]["bias"])
    )

    disp = None
    if cfg.get("calculate_disp", True):
        disp = disp_scale * jax.nn.sigmoid(
            _rconv(out, prm["disp"]["kernel"], prm["disp"]["bias"])
        )
    return out, skip_out, disp


def make_serving_forward(model, variables, s2d_stages=(0, 1),
                         dtype: Optional[Any] = jnp.bfloat16,
                         s2d_conv_backend="pallas", fused_stages=(2, 3, 4),
                         s2d_attention="s2d", decoder_backend="fused",
                         dec_pipeline=None, dec_fold=None, elu_fold=None,
                         smax=None):
    """Returns ``(forward, params)`` where ``forward(params, x, disp_scale=1.0)``
    computes the full-resolution 4-channel [l_disp, r_disp, l_unc, r_unc]
    map (the reference's eval output, model/decoder.py:59-62)."""
    (enc_specs, dec_specs), params = build_serving_params(
        model, variables, s2d_stages=s2d_stages, dtype=dtype,
        s2d_conv_backend=s2d_conv_backend, fused_stages=fused_stages,
        s2d_attention=s2d_attention, decoder_backend=decoder_backend,
        dec_pipeline=dec_pipeline, dec_fold=dec_fold, elu_fold=elu_fold,
        smax=smax,
    )

    def forward(params, x, disp_scale=1.0):
        if dtype is not None:
            x = x.astype(dtype)
        feats = []
        h = x
        for i, (spec, prm) in enumerate(zip(enc_specs, params["encoder"])):
            with jax.named_scope(f"enc{i}"):
                h = _encoder_stage_apply(prm, spec, h)
            # the decoder consumes native-layout skips; consecutive s2d
            # stages hand the s2d tensor over directly (no conversion) and
            # the single depth_to_space here is reused for both the skip
            # AND the first non-s2d-input successor.  (attn_native stages
            # already return native tensors.)
            emits_s2d = spec.s2d and not spec.attn_native
            native = depth_to_space(h) if emits_s2d else h
            feats.append(native)
            next_spec = enc_specs[i + 1] if i + 1 < len(enc_specs) else None
            if emits_s2d and not (next_spec is not None and next_spec.s2d_in):
                h = native

        f1, f2, f3, f4, x4 = feats
        dp = params["decoder"]

        # hard-wired 5-stage dataflow (reference model/decoder.py:49-57):
        # the deepest map is its own skip
        fms = (f4, f3, f2, f1, x)
        out, skip, disp = x4, x4, None
        for i, cfg in enumerate(dec_specs):
            with jax.named_scope(f"dec{i}"):
                if cfg.get("fused"):
                    out, skip, disp = _decoder_stage_apply_fused(
                        dp[i], cfg, out, fms[i], skip, disp, disp_scale)
                else:
                    # a fused predecessor may hand over a pre-ELU out
                    # and/or a (cat, gate-scale) skip handle; materialise
                    # both for the generic stage (unreachable in the
                    # production config, where the fused stages are a
                    # suffix)
                    if cfg.get("x_needs_elu"):
                        out = jax.nn.elu(out)
                    if isinstance(skip, tuple):
                        t, sc = skip
                        skip = t if sc is None else t * sc.astype(t.dtype)
                    out, skip, disp = _decoder_stage_apply(
                        dp[i], cfg, out, fms[i], skip, disp,
                        disp_scale=disp_scale)
        return disp

    return forward, params
