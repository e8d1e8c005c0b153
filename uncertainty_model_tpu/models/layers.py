"""Layer zoo (flax.linen, NHWC).

Numeric parity targets (reference file:line cited per class).  All modules
are pure-functional; BatchNorm state lives in the ``batch_stats`` collection
and synchronises across data-parallel shards automatically because the jitted
step computes batch statistics over the *global* (mesh-sharded) batch — the
TPU-native equivalent of the reference's SyncBatchNorm (parallel_main.py:157).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import pad2d, pixel_shuffle, resize_bilinear
from .graph import GraphSpec

# ---------------------------------------------------------------------------
# Initialisers replicating torch defaults (for training-from-scratch fidelity;
# parity tests bypass these by loading converted torch weights).
# ---------------------------------------------------------------------------

xavier_uniform = nn.initializers.xavier_uniform()

# When True, an optimization barrier is placed on every conv input, stopping
# XLA from fusing long elementwise producer chains into the convolution
# (which can force a slow spatial emitter instead of the MXU).  Measured +8%
# end-to-end inference throughput on v5e; semantically a no-op.
CONV_INPUT_BARRIER = True


def _maybe_barrier(x: jnp.ndarray) -> jnp.ndarray:
    if CONV_INPUT_BARRIER:
        return jax.lax.optimization_barrier(x)
    return x


def torch_fanin_uniform(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch's default conv/linear bias
    (and kaiming_uniform(a=sqrt(5)) linear weight) distribution."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# ---------------------------------------------------------------------------
# Encoder blocks
# ---------------------------------------------------------------------------


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch ``nn.BatchNorm2d`` train/eval semantics.

    flax ``nn.BatchNorm`` accumulates the BIASED batch variance into the
    running ``var``; torch accumulates the UNBIASED one (Bessel factor
    n/(n-1)) while still normalising the batch with the biased variance
    (reference model/layers/encoder.py:43 under torch defaults).  The
    factor is material at the deep stages (n = B*H*W can be 16 at the
    bottleneck -> 6.7% variance skew) and surfaced as eval-mode drift after
    multi-step training (tests/test_train_trajectory.py).  Parameter /
    collection names match ``nn.BatchNorm`` ("scale"/"bias" params,
    "mean"/"var" batch_stats), so checkpoints and the torch->flax weight
    converter are unaffected.

    Statistics are computed in f32 over the GLOBAL (mesh-sharded) batch
    under jit, so data-parallel training gets exact sync-BN (the
    reference's SyncBatchNorm, parallel_main.py:157) with the Bessel n
    being the global count — torch SyncBatchNorm's convention too.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf - mean), axis=axes)
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                bessel = jnp.float32(n / (n - 1)) if n > 1 else jnp.float32(1)
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var * bessel
        dt = self.dtype or x.dtype
        inv = (jax.lax.rsqrt(var + self.epsilon) * scale).astype(dt)
        return (x - mean.astype(dt)) * inv + bias.astype(dt)


class ConvBNELU(nn.Module):
    """Zero-pad -> Conv -> BatchNorm -> ELU (reference model/layers/
    encoder.py:21-52, ``ConvELUBlock``).

    The symmetric zero padding of (k-1)//2 is folded into the conv's explicit
    padding so XLA sees a single conv op.

    ``s2d=True`` runs the (stride-1) conv in the 2x2 space-to-depth domain
    (input/output are s2d tensors; see ops/s2d.py): the kernel is transformed
    in-graph (differentiable — each original tap maps injectively into the
    s2d kernel, so gradients accumulate exactly), and BatchNorm sees the
    tensor reshaped to (..., 4, C) so its statistics are computed per
    ORIGINAL channel over all four phases — identical semantics to the
    direct path, with full 128-lane conv operands on TPU.  Parameter shapes
    and names are unchanged in both modes (checkpoint-compatible).
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    s2d: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from jax import lax

        from ..ops import s2d_bias, s2d_conv_kernel

        k = self.kernel_size
        phases = 4 if self.s2d else 1
        in_channels = x.shape[-1] // phases

        kernel, bias = _ConvParams(
            in_channels, self.out_channels, k, name="conv"
        )()
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)

        if self.s2d:
            assert self.stride == 1, "s2d path is for the stride-1 interior"
            kernel, bias = s2d_conv_kernel(kernel), s2d_bias(bias)
        p = (kernel.shape[0] - 1) // 2
        x = lax.conv_general_dilated(
            _maybe_barrier(x), kernel, (self.stride, self.stride),
            [(p, p), (p, p)], dimension_numbers=_DN,
        ) + bias

        if self.s2d:
            b_, h_, w_, _ = x.shape
            x = x.reshape(b_, h_, w_, 4, self.out_channels)
        x = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn"
        )(x)
        x = nn.elu(x)
        if self.s2d:
            x = x.reshape(b_, h_, w_, 4 * self.out_channels)
        return x


def _resize_reflect(x: jnp.ndarray, target_h: int, target_w: int) -> jnp.ndarray:
    """Reflect-pad spatial alignment (reference model/layers/encoder.py:92-113)."""
    dh = target_h - x.shape[1]
    dw = target_w - x.shape[2]
    return pad2d(x, (dw // 2, dw - dw // 2, dh // 2, dh - dh // 2), mode="reflect")


class NodeBlock(nn.Module):
    """Per-DAG-node conv block (reference model/layers/encoder.py:55-127).

    Input nodes downsample with a stride-2 conv; all other nodes keep the
    resolution and use in_channels == out_channels.  Multi-input nodes blend
    their inputs with a sigmoid-gated learnable weighted sum.

    ``parity_weight_indexing`` replicates the reference's indexing quirk
    (encoder.py:117-123): ``mean_weight[0]`` gates both the first *and*
    second input, and the final weight is never used.  Set False for the
    clean one-weight-per-input behaviour.
    """

    node: object  # graph.Node (static)
    out_channels: int
    kernel_size: int
    parity_weight_indexing: bool = True
    s2d: bool = False  # non-input nodes only: operate in the s2d domain
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, *inputs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        n_inputs = len(self.node.inputs)

        if n_inputs > 1:
            mean_weight = self.param(
                "mean_weight", nn.initializers.ones, (n_inputs,)
            )
            # sigmoid in param precision (f32), gates cast to compute dtype
            gates = jax.nn.sigmoid(mean_weight).astype(inputs[0].dtype)
            out = gates[0] * inputs[0]
            for i, x in enumerate(inputs[1:]):
                if x.shape[1] != out.shape[1]:
                    assert not self.s2d, "s2d nodes must share one resolution"
                    x = _resize_reflect(x, out.shape[1], out.shape[2])
                idx = i if self.parity_weight_indexing else i + 1
                out = out + gates[idx] * x
        else:
            out = inputs[0]

        stride = 2 if self.node.node_type == "input" else 1
        return ConvBNELU(
            self.out_channels, self.kernel_size, stride=stride,
            s2d=self.s2d and stride == 1, dtype=self.dtype, name="conv_block",
        )(out, train=train)


class GraphBlock(nn.Module):
    """Executes the DAG of NodeBlocks (reference model/layers/encoder.py:130-198).

    The topology is static, so the Python loop unrolls at trace time into a
    fixed XLA dataflow graph.
    """

    graph: GraphSpec
    out_channels: int
    kernel_size: int
    s2d: bool = False  # run the stride-1 interior in the s2d domain
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from ..ops import depth_to_space, space_to_depth

        blocks = {
            node.id: NodeBlock(
                node, self.out_channels, self.kernel_size,
                s2d=self.s2d and node.node_type != "input",
                dtype=self.dtype, name=f"node_{node.id}",
            )
            for node in self.graph.nodes
        }

        results: dict[int, jnp.ndarray] = {}
        for idx in self.graph.in_nodes:
            r = blocks[idx](x, train=train)
            results[idx] = space_to_depth(r) if self.s2d else r

        for node in self.graph.nodes:
            if node.id in results:
                continue
            inputs = [results[i] for i in node.inputs]
            results[node.id] = blocks[node.id](*inputs, train=train)

        out = None
        for idx in self.graph.out_nodes:
            r = results[idx]
            if out is None:
                out = r
                continue
            if r.shape[1] != out.shape[1]:
                r = _resize_reflect(r, out.shape[1], out.shape[2])
            out = out + r

        out = out / len(self.graph.out_nodes)
        return depth_to_space(out) if self.s2d else out


class EfficientAttention(nn.Module):
    """Linear attention, O(N) in spatial tokens (Shen et al., arXiv:1812.01243;
    reference model/layers/attention.py).

    Per head: softmax over the keys' token axis and the queries' channel
    axis; the (c_k x c_v) context matrix makes global attention over up to
    32k tokens cheap.  All contractions are einsums -> MXU.
    """

    key_channels: int
    value_channels: int
    head_count: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        n = h * w
        heads = self.head_count
        ck = self.key_channels // heads
        cv = self.value_channels // heads

        def proj(features, name):
            # split heads on the channel axis only — (B,H,W,heads,ch) — so
            # no (B,N,...) token flatten relayouts the whole map
            return nn.Conv(
                features,
                (1, 1),
                kernel_init=xavier_uniform,
                bias_init=torch_fanin_uniform(c),
                dtype=self.dtype,
                name=name,
            )(x).reshape(b, h, w, heads, features // heads)

        keys = proj(self.key_channels, "keys")
        queries = proj(self.key_channels, "queries")
        values = proj(self.value_channels, "values")

        # softmax with f32 reductions but no materialised f32 copies: the max
        # and the exp-sum accumulate in f32, data stays in compute dtype
        def softmax(v, axis):
            if v.dtype == jnp.float32:
                return jax.nn.softmax(v, axis=axis)
            m = jnp.max(v.astype(jnp.float32), axis=axis, keepdims=True)
            e = jnp.exp(v - m.astype(v.dtype))
            s = jnp.sum(e, axis=axis, keepdims=True, dtype=jnp.float32)
            return e * (1.0 / s).astype(v.dtype)

        keys = softmax(keys, (1, 2))  # over tokens (both spatial axes)
        queries = softmax(queries, -1)  # over per-head channels

        # context: (B, heads, ck, cv); attended: (B, H, W, heads, cv)
        context = jnp.einsum("bxyhk,bxyhv->bhkv", keys, values)
        attended = jnp.einsum("bhkv,bxyhk->bxyhv", context, queries)
        attended = attended.reshape(b, h, w, heads * cv)

        out = nn.Conv(
            c,
            (1, 1),
            kernel_init=xavier_uniform,
            bias_init=torch_fanin_uniform(self.value_channels),
            dtype=self.dtype,
            name="reprojection",
        )(attended)
        return out + x


class EncoderStage(nn.Module):
    """GraphBlock + EfficientAttention (reference model/layers/encoder.py:201-262)."""

    graph: GraphSpec
    out_channels: int
    kernel_size: int
    heads: int = 8
    s2d: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = GraphBlock(self.graph, self.out_channels, self.kernel_size,
                       s2d=self.s2d, dtype=self.dtype, name="graph")(x, train=train)
        return EfficientAttention(
            self.out_channels, self.out_channels, self.heads,
            dtype=self.dtype, name="attention",
        )(x)


# ---------------------------------------------------------------------------
# Decoder blocks
# ---------------------------------------------------------------------------


class _ConvParams(nn.Module):
    """Parameter-only holder so raw lax.conv calls can share one kernel/bias
    across different padding configurations (named 'conv' -> identical
    checkpoint paths to an nn.Conv submodule)."""

    in_channels: int
    out_channels: int
    kernel_size: int

    @nn.compact
    def __call__(self):
        k = self.kernel_size
        kernel = self.param(
            "kernel", xavier_uniform, (k, k, self.in_channels, self.out_channels)
        )
        bias = self.param(
            "bias", torch_fanin_uniform(self.in_channels * k * k),
            (self.out_channels,),
        )
        return kernel, bias


_DN = ("NHWC", "HWIO", "NHWC")


def _reflect_conv(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                  act=None, pre=None) -> jnp.ndarray:
    """Same-size reflect(1)-padded 3x3 conv without materialising the padded
    tensor (see ops/conv.py): one conv with *internal* zero padding (already
    correct everywhere except the 1-pixel border), then the four border
    strips — recomputed from reflect-padded 3-row/3-col slices — are written
    in place with dynamic_update_slice.  Bit-exact with pad-then-conv.

    ``pre`` / ``act`` are optional elementwise hooks applied to each conv
    piece's input / biased output.  Because they are elementwise they
    commute with the DUS border writes, so ``_reflect_conv(x, k, b, act=f,
    pre=g)`` == ``f(_reflect_conv(g(x), k, b))`` exactly — but each hook has
    exactly ONE conv consumer per piece, so XLA fuses it into the conv
    instead of materialising a full-tensor pass (serving.py gate/ELU
    folding; ``pre`` must be spatially pointwise, e.g. a per-(batch,
    channel) scale or an activation, so it commutes with the strip
    slicing/padding)."""
    import jax.lax as lax

    def conv(inp, padding):
        if pre is not None:
            inp = pre(inp)
        out = lax.conv_general_dilated(inp, kernel, (1, 1), padding,
                                       dimension_numbers=_DN)
        out = out + bias
        return act(out) if act is not None else out

    full = conv(x, [(1, 1), (1, 1)])  # internal zero pad, no copy

    top = conv(pad2d(jnp.concatenate([x[:, 1:2], x[:, 0:2]], axis=1),
                     (1, 1, 0, 0), "reflect"), "VALID")
    bottom = conv(pad2d(jnp.concatenate([x[:, -2:], x[:, -2:-1]], axis=1),
                        (1, 1, 0, 0), "reflect"), "VALID")
    left = conv(pad2d(jnp.concatenate([x[:, :, 1:2], x[:, :, 0:2]], axis=2),
                      (0, 0, 1, 1), "reflect"), "VALID")
    right = conv(pad2d(jnp.concatenate([x[:, :, -2:], x[:, :, -2:-1]], axis=2),
                       (0, 0, 1, 1), "reflect"), "VALID")

    h, w = x.shape[1], x.shape[2]
    out = lax.dynamic_update_slice(full, top, (0, 0, 0, 0))
    out = lax.dynamic_update_slice(out, bottom, (0, h - 1, 0, 0))
    out = lax.dynamic_update_slice(out, left, (0, 0, 0, 0))
    out = lax.dynamic_update_slice(out, right, (0, 0, w - 1, 0))
    return out


class ConvLayer(nn.Module):
    """(Reflection|Zero)Pad -> Conv -> optional Sigmoid (reference
    model/layers/decoder.py:11-52).

    TPU-tuned lowering (all bit-exact with pad-then-conv):
      * reflection padding: internally-zero-padded conv + in-place border
        fixup (no full-tensor pad copy);
      * zero padding: folded into the conv op;
      * 1x1 convs accept a TUPLE of inputs and split the kernel per input,
        skipping the concat's full-tensor write+read.
    """

    out_channels: int
    padding: bool = True
    reflection: bool = True
    sigmoid: bool = False
    kernel_size: int = 3
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        from jax import lax

        k = self.kernel_size
        parts = list(x) if isinstance(x, (list, tuple)) else [x]
        in_channels = sum(p.shape[-1] for p in parts)

        kernel, bias = _ConvParams(in_channels, self.out_channels, k, name="conv")()
        if self.dtype is not None:
            parts = [p.astype(self.dtype) for p in parts]
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)

        if len(parts) > 1 and k == 1 and not self.padding:
            # split-concat conv: conv(concat(a, b)) == conv_a(a) + conv_b(b)
            out = None
            offset = 0
            for p in parts:
                w = kernel[:, :, offset:offset + p.shape[-1]]
                offset += p.shape[-1]
                y = lax.conv_general_dilated(p, w, (1, 1), "VALID",
                                             dimension_numbers=_DN)
                out = y if out is None else out + y
            x = out + bias
        else:
            x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
            if self.padding and self.reflection and k == 3 and x.shape[1] >= 3 \
                    and x.shape[2] >= 3:
                x = _reflect_conv(x, kernel, bias)
            else:
                if self.padding and self.reflection:
                    x = pad2d(x, (1, 1, 1, 1), mode="reflect")
                    pad = "VALID"
                elif self.padding:
                    p = (k - 1) // 2
                    pad = [(p, p), (p, p)]  # zero pad folded into the conv
                else:
                    pad = "VALID"
                x = lax.conv_general_dilated(x, kernel, (1, 1), pad,
                                             dimension_numbers=_DN) + bias

        if self.sigmoid:
            x = jax.nn.sigmoid(x)
        return x


class DecoderConvELU(nn.Module):
    """ConvLayer -> optional BatchNorm -> ELU (reference
    model/layers/decoder.py:55-87)."""

    out_channels: int
    padding: bool = True
    kernel_size: int = 3
    batch_norm: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvLayer(
            self.out_channels, padding=self.padding, kernel_size=self.kernel_size,
            dtype=self.dtype, name="conv_layer",
        )(x)
        if self.batch_norm:
            x = TorchBatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn",
            )(x)
        return nn.elu(x)


class SELayer(nn.Module):
    """Squeeze-excitation channel attention (reference
    model/layers/decoder.py:90-136)."""

    channels: int
    reduction: int = 16
    fc: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        reduced = self.channels // self.reduction
        # global mean reduced in f32 (128k+ pixels), result in compute dtype
        squeezed = jnp.mean(x, axis=(1, 2), dtype=jnp.float32).astype(x.dtype)

        if self.fc:
            init = torch_fanin_uniform(self.channels)
            s = nn.Dense(reduced, use_bias=False, kernel_init=init,
                         dtype=self.dtype, name="fc1")(squeezed)
            s = nn.relu(s)
            s = nn.Dense(
                self.channels, use_bias=False,
                kernel_init=torch_fanin_uniform(reduced),
                dtype=self.dtype, name="fc2",
            )(s)
        else:
            s = squeezed[:, None, None, :]
            s = nn.Conv(reduced, (1, 1), dtype=self.dtype, name="conv1")(s)
            s = nn.relu(s)
            s = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="conv2")(s)
            s = s[:, 0, 0, :]

        s = jax.nn.sigmoid(s)
        return x * s[:, None, None, :]


class DecoderStage(nn.Module):
    """One decoder stage: pixel-shuffle upsample, squeeze-excite skip fusion,
    iconv and optional sigmoid disparity head (reference
    model/layers/decoder.py:139-249).

    Field names match the reference constructor kwargs so ``config.yml``
    entries **-unpack directly.
    """

    in_channels: int
    feature_in_channels: int
    skip_in_channels: int
    upsample_channels: int
    out_channels: int
    skip_out_channels: int
    disp_channels: int = 2
    batch_norm: bool = True
    fc: bool = True
    scale: int = 2
    concat_disp: bool = True
    calculate_disp: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        feature_map: jnp.ndarray,
        skip: jnp.ndarray,
        disparity: Optional[jnp.ndarray] = None,
        disp_scale: float = 1.0,
        train: bool = False,
    ):
        r = self.scale

        skip = resize_bilinear(skip, (skip.shape[1] * r, skip.shape[2] * r))
        # tuple input -> the 1x1 conv splits its kernel per input, skipping
        # the concat's full-tensor round trip
        skip = DecoderConvELU(
            self.skip_out_channels, kernel_size=1, batch_norm=True, padding=False,
            dtype=self.dtype, name="se_conv",
        )((feature_map, skip), train=train)
        skip = SELayer(self.skip_out_channels, fc=self.fc, dtype=self.dtype,
                       name="se")(skip)

        x_up = DecoderConvELU(
            self.upsample_channels * r * r, batch_norm=self.batch_norm,
            dtype=self.dtype, name="upsample_conv",
        )(x, train=train)
        x_up = pixel_shuffle(x_up, r)

        x_concat = jnp.concatenate([x_up, skip], axis=-1)

        if self.concat_disp:
            disparity = resize_bilinear(
                disparity, (disparity.shape[1] * r, disparity.shape[2] * r)
            )
            x_concat = jnp.concatenate([x_concat, disparity], axis=-1)

        out = DecoderConvELU(
            self.out_channels, batch_norm=self.batch_norm, dtype=self.dtype,
            name="iconv",
        )(x_concat, train=train)

        disp = None
        if self.calculate_disp:
            disp = disp_scale * ConvLayer(
                self.disp_channels, sigmoid=True, dtype=self.dtype, name="disp"
            )(out)
            disp = disp.astype(x.dtype)

        return out, skip, disp


__all__ = [
    "ConvBNELU",
    "NodeBlock",
    "GraphBlock",
    "EfficientAttention",
    "EncoderStage",
    "ConvLayer",
    "DecoderConvELU",
    "SELayer",
    "DecoderStage",
]
