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


def _conv1x1(x, kernel, bias=None):
    """1x1 conv via lax.conv (NOT einsum: the conv op keeps XLA's NHWC
    activation layouts; a matmul lowering relayouts the whole map)."""
    y = lax.conv_general_dilated(
        _maybe_barrier(x), kernel, (1, 1), "VALID", dimension_numbers=_DN
    )
    return y if bias is None else y + bias


def _rconv(x, kernel, bias):
    """Reflect(1)-padded 3x3 conv: border-fixup lowering for real maps, the
    plain pad fallback for degenerate (<3 px) ones (same dispatch as
    models/layers.py ConvLayer)."""
    if x.shape[1] >= 3 and x.shape[2] >= 3:
        return _reflect_conv(x, kernel, bias)
    x = pad2d(x, (1, 1, 1, 1), mode="reflect")
    y = lax.conv_general_dilated(x, kernel, (1, 1), "VALID", dimension_numbers=_DN)
    return y + bias


def _fold_bn(kernel, bias, bn_params, bn_stats):
    """conv -> eval BN  ==  conv with rescaled kernel/bias (exact)."""
    inv = bn_params["scale"] * lax.rsqrt(bn_stats["var"] + _BN_EPS)
    return kernel * inv, (bias - bn_stats["mean"]) * inv + bn_params["bias"]


def _softmax(v, axis):
    """f32-reduction softmax over possibly-bf16 data (same policy as
    models/layers.py EfficientAttention)."""
    if v.dtype == jnp.float32:
        return jax.nn.softmax(v, axis=axis)
    m = jnp.max(v.astype(jnp.float32), axis=axis, keepdims=True)
    e = jnp.exp(v - m.astype(v.dtype))
    s = jnp.sum(e, axis=axis, keepdims=True, dtype=jnp.float32)
    return e * (1.0 / s).astype(v.dtype)


class _StageSpec(NamedTuple):
    graph: Any  # GraphSpec
    heads: int
    s2d: bool


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


def build_serving_params(model, variables, s2d_stages=(0, 1), dtype=jnp.bfloat16):
    """Fold a trained model's variables into the serving parameter tree.

    Returns ``(specs, params)``: ``specs`` is static (closed over by the
    apply fn), ``params`` is a pytree of arrays (jit operand).
    """
    p, s = variables["params"], variables["batch_stats"]

    enc_specs, enc_params = [], []
    for i, (graph, (out_ch, kernel, heads)) in enumerate(
        zip(model.encoder.graphs, model.encoder.layers)
    ):
        sp, ss = p["encoder"][f"stage_{i}"], s["encoder"][f"stage_{i}"]
        use_s2d = (i in s2d_stages) and kernel >= 5
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
            if use_s2d and node.node_type != "input":
                k, b = s2d_conv_kernel(k), s2d_bias(b)
            entry["kernel"], entry["bias"] = k, b
            if len(node.inputs) > 1:
                entry["gates"] = _node_gates(node, np_["mean_weight"])
            nodes[str(node.id)] = entry
        enc_specs.append(_StageSpec(graph=graph, heads=heads, s2d=use_s2d))
        enc_params.append({"nodes": nodes, "attention": sp["attention"]})

    dec_specs, dec_params = [], []
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

    params = {"encoder": enc_params, "decoder": dec_params}
    if dtype is not None:
        params = jax.tree.map(lambda a: a.astype(dtype), params)
    return (tuple(enc_specs), tuple(dec_specs)), params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _grouped_softmax(v, group):
    """Softmax over channel groups of size ``group`` without the (...,
    heads, ch) reshape — a 5-D head split relayouts the whole map (minor dim
    4 pads 128 lanes 32x; measured ~3 ms/stage on the batch-128 trace).
    Channel-window reduce_windows keep the native NHWC layout."""
    neg_inf = jnp.asarray(-jnp.inf, jnp.float32)
    m = lax.reduce_window(
        v.astype(jnp.float32), neg_inf, lax.max,
        (1, 1, 1, group), (1, 1, 1, group), "VALID",
    )
    e = jnp.exp(v - jnp.repeat(m, group, axis=-1).astype(v.dtype))
    s = lax.reduce_window(
        e.astype(jnp.float32), jnp.asarray(0.0, jnp.float32), lax.add,
        (1, 1, 1, group), (1, 1, 1, group), "VALID",
    )
    inv = (1.0 / s).astype(v.dtype)
    return e * jnp.repeat(inv, group, axis=-1)


def _attention_apply(prm, heads, x):
    """EfficientAttention (reference model/layers/attention.py) on folded
    params.

    Head blocking is expressed as a block-diagonal mask on the FULL (c x c)
    context matrix instead of a 5-D head-split reshape: the extra masked
    FLOPs are trivial (the context matmuls are tiny next to the convs) and
    the activation map never leaves its conv layout.  Identical math: the
    mask zeroes exactly the cross-head context terms.
    """
    b, h, w, c = x.shape

    def proj(name):
        return _conv1x1(x, prm[name]["kernel"], prm[name]["bias"])

    keys = _softmax(proj("keys"), (1, 2))      # per-channel over tokens
    queries = _grouped_softmax(proj("queries"), c // heads)
    values = proj("values")

    context = jnp.einsum("bxyk,bxyv->bkv", keys, values)
    block = c // heads
    mask = jnp.asarray(
        (jnp.arange(c)[:, None] // block) == (jnp.arange(c)[None, :] // block),
        context.dtype,
    )
    attended = jnp.einsum("bkv,bxyk->bxyv", context * mask, queries)

    out = _conv1x1(attended, prm["reprojection"]["kernel"],
                   prm["reprojection"]["bias"])
    return out + x


def _encoder_stage_apply(prm, spec: _StageSpec, x):
    graph = spec.graph

    if spec.s2d:
        # s2d-domain interior: every conv runs as the Pallas kernel
        # (ops/pallas/conv.py) — pallas_call is a layout black box, pinning
        # the MXU-shaped fast path XLA's in-context emitter misses — with
        # the sigmoid gating folded into the kernel (no HBM round trip for
        # the gated sum).  Node outputs are padded ONCE and the padded
        # tensor is shared by every downstream consumer.
        interior = next(n for n in graph.nodes if n.node_type != "input")
        k = prm["nodes"][str(interior.id)]["kernel"].shape[0]
        p = (k - 1) // 2
        one = jnp.ones((1,), jnp.float32)
        pad = None  # set once the s2d width is known

        raw, padded = {}, {}
        for nid in graph.in_nodes:
            node_p = prm["nodes"][str(nid)]
            y = jax.nn.elu(_conv(x, node_p["kernel"], node_p["bias"], stride=2))
            y = space_to_depth(y)
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
            y = gated_conv_elu(xs, gates, node_p["kernel"], node_p["bias"],
                               width=width)
            raw[node.id] = y
            if any(node.id in n.inputs for n in graph.nodes):
                padded[node.id] = jnp.pad(y, pad)

        out = None
        for nid in graph.out_nodes:
            out = raw[nid] if out is None else out + raw[nid]
        out = out / len(graph.out_nodes)
        out = depth_to_space(out)
        return _attention_apply(prm["attention"], spec.heads, out)

    results = {}
    for nid in graph.in_nodes:
        node_p = prm["nodes"][str(nid)]
        results[nid] = jax.nn.elu(
            _conv(x, node_p["kernel"], node_p["bias"], stride=2))

    for node in graph.nodes:
        if node.id in results:
            continue
        node_p = prm["nodes"][str(node.id)]
        inputs = [results[j] for j in node.inputs]
        if len(inputs) > 1:
            gates = node_p["gates"]
            h = gates[0] * inputs[0]
            for gi, inp in enumerate(inputs[1:], start=1):
                if inp.shape != h.shape:
                    raise ValueError(
                        "serving path: unequal node resolutions at node "
                        f"{node.id} ({inp.shape} vs {h.shape}). Structurally "
                        "unreachable for stages built from stride-2 input "
                        "nodes + stride-1 interiors (every WS/K5 graph); use "
                        "the flax path for exotic stages (it carries the "
                        "reference's resize alignment, encoder.py:92-113).")
                h = h + gates[gi] * inp
        else:
            h = inputs[0]
        results[node.id] = jax.nn.elu(
            _conv(h, node_p["kernel"], node_p["bias"]))

    out = None
    for nid in graph.out_nodes:
        out = results[nid] if out is None else out + results[nid]
    out = out / len(graph.out_nodes)
    return _attention_apply(prm["attention"], spec.heads, out)


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
                         dtype: Optional[Any] = jnp.bfloat16):
    """Returns ``(forward, params)`` where ``forward(params, x, disp_scale=1.0)``
    computes the full-resolution 4-channel [l_disp, r_disp, l_unc, r_unc]
    map (the reference's eval output, model/decoder.py:59-62)."""
    (enc_specs, dec_specs), params = build_serving_params(
        model, variables, s2d_stages=s2d_stages, dtype=dtype
    )

    def forward(params, x, disp_scale=1.0):
        if dtype is not None:
            x = x.astype(dtype)
        feats = []
        h = x
        for i, (spec, prm) in enumerate(zip(enc_specs, params["encoder"])):
            with jax.named_scope(f"enc{i}"):
                h = _encoder_stage_apply(prm, spec, h)
            feats.append(h)

        f1, f2, f3, f4, x4 = feats
        dp = params["decoder"]

        def stage(i, *a):
            with jax.named_scope(f"dec{i}"):
                return _decoder_stage_apply(dp[i], dec_specs[i], *a,
                                            disp_scale=disp_scale)

        out5, skip5, _ = stage(0, x4, f4, x4, None)
        out4, skip4, disp4 = stage(1, out5, f3, skip5, None)
        out3, skip3, disp3 = stage(2, out4, f2, skip4, disp4)
        out2, skip2, disp2 = stage(3, out3, f1, skip3, disp3)
        _, _, disp1 = stage(4, out2, x, skip2, disp2)
        return disp1

    return forward, params
