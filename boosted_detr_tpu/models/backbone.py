"""CNN backbones + neck (Flax), TPU-first.

Replaces reference: ModelComponents/backbone.py (Keras EfficientNetB4 with
``weights=None`` — i.e. trained from scratch, backbone.py:28-31 — or
ResNet50). Because the reference trains its backbone from scratch, no
pretrained-weight porting is needed for parity (SURVEY §7); these are
original Flax implementations.

TPU-first notes:
- The default flagship backbone is a ResNet-style network: dense 3x3 convs
  have high arithmetic intensity and map straight onto the 128x128 MXU,
  whereas EfficientNet's depthwise convs are HBM-bandwidth-bound on TPU. An
  EfficientNet-lite-style backbone (MBConv, ReLU6, no squeeze-excite) is
  provided for reference-default parity (``backbone='efficientnet_lite'``).
- All convs run in the configured compute dtype (bf16 by default); batch
  norm statistics accumulate in f32.
- Output stride is 32, matching the reference's grid
  ((H/32)x(W/32) tokens, reference transformers.py:266-275).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from boosted_detr_tpu.models.layers import (MultiheadAttention,
                                            trig_positional_init)


class _AdaptiveGroupNorm(nn.Module):
    """GroupNorm whose group count is the largest divisor of the channel
    count <= 32 (plain GroupNorm(32) crashes on channel counts that 32 does
    not divide, e.g. efficientnet_lite stage widths)."""

    dtype_: Any

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        groups = next(g for g in range(min(32, c), 0, -1) if c % g == 0)
        return nn.GroupNorm(num_groups=groups, epsilon=1e-3,
                            dtype=self.dtype_, name="gn")(x)


def make_norm(norm: str, train: bool, dtype: jnp.dtype,
              name: str) -> Callable:
    """BatchNorm (Keras-default momentum .99 / eps 1e-3) or GroupNorm — the
    parity flag for BatchNorm-under-pjit concerns (SURVEY §7 hard-part 3).
    Under jit/GSPMD the batch axis is global, so BatchNorm stats are
    cross-replica automatically. ``skipinit`` removes activation
    normalization entirely (see ``ResNetBackbone``): convs are
    weight-standardized instead, so this returns identity."""
    if norm == "batchnorm":
        return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                            epsilon=1e-3, dtype=dtype, name=name)
    if norm == "groupnorm":
        return _AdaptiveGroupNorm(dtype, name=name)
    if norm == "skipinit":
        return lambda x: x
    raise ValueError(f"unknown norm '{norm}'")


class WSConv(nn.Module):
    """Weight-standardized conv (Qiao et al.; Brock et al. NF-ResNets): the
    kernel is standardized over its fan-in at use time and scaled by a
    learned per-output-channel gain. Parameter-sized math only — the
    activation tensor is touched ONCE, which is the whole point: a training
    BatchNorm forces two extra passes over the activation (stats reduce +
    normalize), and at 80x80x512/bs8 those passes are the flagship's HBM
    roofline (benchmarks/RESULTS.md)."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        in_feats = x.shape[-1] // self.groups
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (kh, kw, in_feats, self.features), jnp.float32)
        gain = self.param("gain", nn.initializers.ones, (self.features,),
                          jnp.float32)
        fan_in = kh * kw * in_feats
        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
        # NF scaling: unit-variance outputs at init regardless of fan-in
        w = (kernel - mean) * jax.lax.rsqrt(var * fan_in + 1e-4)
        w = (w * gain).astype(self.dtype)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w, window_strides=self.strides,
            padding="SAME", feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype)


class PallasPatchifyConv(nn.Module):
    """Patchify conv backed by the fused Pallas stem kernel
    (ops/pallas_patchify.py): one HBM pass does clip + preprocessing +
    space-to-depth + matmul, replacing ~2.5 ms of convert/relayout/
     3-channel-conv in the 640px train step. The param tree mirrors
    ``nn.Conv`` (default mode) or ``WSConv`` (weight-standardized mode)
    exactly, so checkpoints interchange with the XLA stem.

    ``preprocess=(a, b, perm, clip01)`` folds the per-channel input affine
    ``a * x[..., perm] + b`` into the weights: ``conv(a*x[perm]+b, W) =
    conv(x, W') + bias`` with ``W'[..., c, :] = (W * a)[..., inv(c), :]``
    and ``bias = sum_dc W[d,c,:] b[c]`` — so the raw [0,1] image is read
    exactly once."""

    features: int
    patch: int
    weight_standardized: bool = False
    use_bias: bool = False  # nn.Conv-parity bias (ViT patch embed)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, preprocess=None):
        from boosted_detr_tpu.ops.pallas_patchify import patchify_conv

        c_in = x.shape[-1]
        init = (nn.initializers.he_normal() if self.weight_standardized
                else nn.initializers.lecun_normal())
        kernel = self.param("kernel", init,
                            (self.patch, self.patch, c_in, self.features),
                            jnp.float32)
        if self.weight_standardized:  # WSConv math, param parity included
            gain = self.param("gain", nn.initializers.ones,
                              (self.features,), jnp.float32)
            fan_in = self.patch * self.patch * c_in
            mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
            var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
            kernel = (kernel - mean) * jax.lax.rsqrt(var * fan_in + 1e-4)
            kernel = kernel * gain
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        clip01 = False
        if preprocess is not None:
            a, b, perm, clip01 = preprocess
            fold = jnp.einsum("ijco,c->o", kernel, b)
            bias = fold if bias is None else bias + fold
            kernel = kernel * a.reshape(1, 1, -1, 1)
            if perm is not None:
                # x[perm] contraction -> inverse-permute the channel axis
                kernel = kernel[:, :, list(np.argsort(perm)), :]
        y = patchify_conv(x, kernel.astype(self.dtype),
                          out_dtype=self.dtype, clip01=clip01)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class ConvNormAct(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    norm: str = "batchnorm"
    act: Callable = nn.relu
    dtype: jnp.dtype = jnp.float32
    groups: int = 1
    pallas_patchify: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False, preprocess=None):
        if self.pallas_patchify:
            assert (self.kernel == self.strides
                    and self.kernel[0] == self.kernel[1]
                    and self.groups == 1), "pallas stem: square patch conv"
            x = PallasPatchifyConv(
                self.features, self.kernel[0],
                weight_standardized=(self.norm == "skipinit"),
                dtype=self.dtype, name="conv")(x, preprocess)
            if self.norm != "skipinit":
                x = make_norm(self.norm, train, self.dtype, "norm")(x)
            return self.act(x) if self.act is not None else x
        assert preprocess is None, "preprocess folding needs the pallas stem"
        if self.norm == "skipinit":
            # norm-free path: weight-standardized conv, no activation norm
            x = WSConv(self.features, self.kernel, self.strides, self.groups,
                       self.dtype, name="conv")(x)
        else:
            x = nn.Conv(self.features, self.kernel, self.strides,
                        padding="SAME", use_bias=False,
                        feature_group_count=self.groups,
                        dtype=self.dtype, name="conv")(x)
            x = make_norm(self.norm, train, self.dtype, "norm")(x)
        return self.act(x) if self.act is not None else x


class BottleneckBlock(nn.Module):
    """ResNet-v1.5 bottleneck: 1x1 reduce -> 3x3 (stride) -> 1x1 expand."""

    features: int  # output width (4x the bottleneck width)
    strides: Tuple[int, int] = (1, 1)
    norm: str = "batchnorm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        mid = self.features // 4
        residual = x
        y = ConvNormAct(mid, (1, 1), norm=self.norm, dtype=self.dtype,
                        name="conv1")(x, train=train)
        y = ConvNormAct(mid, (3, 3), self.strides, norm=self.norm,
                        dtype=self.dtype, name="conv2")(y, train=train)
        y = ConvNormAct(self.features, (1, 1), norm=self.norm, act=None,
                        dtype=self.dtype, name="conv3")(y, train=train)
        if residual.shape != y.shape:
            residual = ConvNormAct(self.features, (1, 1), self.strides,
                                   norm=self.norm, act=None, dtype=self.dtype,
                                   name="proj")(x, train=train)
        if self.norm == "skipinit":
            # SkipInit (De & Smith 2020): zero-init scalar on the residual
            # branch restores BN's identity-at-init property, which is what
            # lets deep norm-free ResNets train stably.
            gain = self.param("skip_gain", nn.initializers.zeros, (),
                              jnp.float32)
            y = y * gain.astype(y.dtype)
        return nn.relu(y + residual)


class ResNetBackbone(nn.Module):
    """ResNet-50-style backbone, stride 32. ``width`` scales channel counts.

    ``stem='patchify'`` swaps the classic 7x7/s2 conv + 3x3/s2 maxpool for a
    single 4x4/s4 ("patchify") conv with the same output contract (stride 4,
    w(64) channels). TPU rationale: the 7x7 stem conv runs at <8 TFLOP/s on
    the MXU (3 input channels waste the reduction lanes; the 640px input
    needs a layout copy), and the maxpool's backward is a select-and-scatter
    — together ~6 ms of a 32 ms 640px/bs8 train step. The patchify stem's
    conv is 12x fewer FLOPs, needs no pool, and halves the 320x320
    intermediate traffic (ConvNeXt showed patchify stems match quality).

    ``stem='patchify8'`` goes one step further: an 8x8/s8 conv to w(128)
    channels followed by stages (4, 6, 3) at strides (1, 2, 2) and widths
    (512, 1024, 2048) — i.e. the highest-resolution stage starts at H/8,
    skipping the stride-4 stage whose BatchNorm activation traffic is the
    flagship's HBM-roofline bound (~11.5 ms of a 27.8 ms 640px/bs8 step at
    160x160; benchmarks/RESULTS.md). Output contract unchanged (stride 32,
    w(2048) channels)."""

    width: float = 1.0
    depths: Sequence[int] = (3, 4, 6, 3)
    norm: str = "batchnorm"
    dtype: jnp.dtype = jnp.float32
    stem: str = "conv7"
    pallas_stem: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False, preprocess=None):
        w = lambda c: max(32, int(c * self.width))  # noqa: E731
        if self.stem == "patchify8":
            x = ConvNormAct(w(128), (8, 8), (8, 8), norm=self.norm,
                            dtype=self.dtype, name="stem",
                            pallas_patchify=self.pallas_stem)(
                                x, train=train, preprocess=preprocess)
            stages = zip(self.depths[1:], (w(512), w(1024), w(2048)))
            for stage, (depth, feats) in enumerate(stages, start=1):
                for i in range(depth):
                    strides = (2, 2) if (i == 0 and stage > 1) else (1, 1)
                    x = BottleneckBlock(feats, strides, self.norm, self.dtype,
                                        name=f"stage{stage}_block{i}")(
                                            x, train=train)
            return x
        if self.stem == "patchify":
            # (an explicit space-to-depth + 1x1-conv form measured the same:
            # the s2d transpose costs what the conv's layout copy costs —
            # the pallas_stem kernel is the form that actually removes it)
            x = ConvNormAct(w(64), (4, 4), (4, 4), norm=self.norm,
                            dtype=self.dtype, name="stem",
                            pallas_patchify=self.pallas_stem)(
                                x, train=train, preprocess=preprocess)
        else:
            assert preprocess is None
            x = ConvNormAct(w(64), (7, 7), (2, 2), norm=self.norm,
                            dtype=self.dtype, name="stem")(x, train=train)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for stage, (depth, feats) in enumerate(
                zip(self.depths, (w(256), w(512), w(1024), w(2048)))):
            for i in range(depth):
                strides = (2, 2) if (i == 0 and stage > 0) else (1, 1)
                x = BottleneckBlock(feats, strides, self.norm, self.dtype,
                                    name=f"stage{stage}_block{i}")(
                                        x, train=train)
        return x


class MBConvBlock(nn.Module):
    """EfficientNet-lite MBConv: 1x1 expand -> depthwise -> 1x1 project,
    ReLU6, no squeeze-excite."""

    features: int
    expand: int = 6
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    norm: str = "batchnorm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        relu6 = lambda v: jnp.minimum(nn.relu(v), 6.0)  # noqa: E731
        in_feats = x.shape[-1]
        residual = x
        y = x
        if self.expand != 1:
            y = ConvNormAct(in_feats * self.expand, (1, 1), norm=self.norm,
                            act=relu6, dtype=self.dtype, name="expand")(
                                y, train=train)
        y = ConvNormAct(y.shape[-1], self.kernel, self.strides,
                        norm=self.norm, act=relu6, dtype=self.dtype,
                        groups=y.shape[-1], name="depthwise")(y, train=train)
        y = ConvNormAct(self.features, (1, 1), norm=self.norm, act=None,
                        dtype=self.dtype, name="project")(y, train=train)
        if self.strides == (1, 1) and in_feats == self.features:
            y = y + residual
        return y


class EfficientNetLiteBackbone(nn.Module):
    """EfficientNet-lite-style backbone, stride 32 (reference default is
    EfficientNetB4 from scratch, backbone.py:28-31)."""

    width: float = 1.0
    norm: str = "batchnorm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        relu6 = lambda v: jnp.minimum(nn.relu(v), 6.0)  # noqa: E731
        w = lambda c: max(16, int(c * self.width))  # noqa: E731
        x = ConvNormAct(w(32), (3, 3), (2, 2), norm=self.norm, act=relu6,
                        dtype=self.dtype, name="stem")(x, train=train)
        # (features, depth, stride, kernel, expand)
        stages = (
            (w(16), 1, (1, 1), (3, 3), 1),
            (w(24), 2, (2, 2), (3, 3), 6),
            (w(40), 2, (2, 2), (5, 5), 6),
            (w(80), 3, (2, 2), (3, 3), 6),
            (w(112), 3, (1, 1), (5, 5), 6),
            (w(192), 4, (2, 2), (5, 5), 6),
            (w(320), 1, (1, 1), (3, 3), 6),
        )
        for s, (feats, depth, strides, kernel, expand) in enumerate(stages):
            for i in range(depth):
                x = MBConvBlock(feats, expand, kernel,
                                strides if i == 0 else (1, 1), self.norm,
                                self.dtype, name=f"stage{s}_block{i}")(
                                    x, train=train)
        x = ConvNormAct(w(1280), (1, 1), norm=self.norm, act=relu6,
                        dtype=self.dtype, name="head")(x, train=train)
        return x


class SEBlock(nn.Module):
    """Squeeze-and-Excitation: global-average pool -> 1x1 reduce (swish) ->
    1x1 restore (sigmoid) -> channel gate. ``se_filters`` follows the
    EfficientNet rule: max(1, int(block_input_channels * se_ratio)) — the
    reduction is relative to the block INPUT, not the expanded width."""

    se_filters: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        s = nn.Conv(self.se_filters, (1, 1), dtype=self.dtype,
                    name="reduce")(s.astype(self.dtype))
        s = nn.swish(s)
        s = nn.Conv(c, (1, 1), dtype=self.dtype, name="expand")(s)
        return x * jax.nn.sigmoid(s.astype(jnp.float32)).astype(x.dtype)


class MBConvSEBlock(nn.Module):
    """Faithful EfficientNet MBConv: 1x1 expand -> depthwise -> SE ->
    1x1 project, swish activations, stochastic depth on the residual
    (Tan & Le 2019; the reference's default backbone is keras
    ``EfficientNetB4(weights=None)``, reference backbone.py:28-31)."""

    features: int
    expand: int = 6
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    se_ratio: float = 0.25
    drop_rate: float = 0.0  # stochastic-depth rate for this block
    norm: str = "batchnorm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_feats = x.shape[-1]
        residual = x
        y = x
        if self.expand != 1:
            y = ConvNormAct(in_feats * self.expand, (1, 1), norm=self.norm,
                            act=nn.swish, dtype=self.dtype, name="expand")(
                                y, train=train)
        y = ConvNormAct(y.shape[-1], self.kernel, self.strides,
                        norm=self.norm, act=nn.swish, dtype=self.dtype,
                        groups=y.shape[-1], name="depthwise")(y, train=train)
        if self.se_ratio:
            y = SEBlock(max(1, int(in_feats * self.se_ratio)),
                        dtype=self.dtype, name="se")(y)
        y = ConvNormAct(self.features, (1, 1), norm=self.norm, act=None,
                        dtype=self.dtype, name="project")(y, train=train)
        if self.strides == (1, 1) and in_feats == self.features:
            if train and self.drop_rate > 0.0:
                # stochastic depth (keras 'drop' layer, noise on batch only)
                keep = 1.0 - self.drop_rate
                rng = self.make_rng("dropout")
                mask = jax.random.bernoulli(rng, keep, (y.shape[0], 1, 1, 1))
                y = y * (mask.astype(y.dtype) / keep)
            y = y + residual
        return y


def _round_filters(filters: float, width: float, divisor: int = 8) -> int:
    """EfficientNet channel rounding (Tan & Le 2019, keras semantics)."""
    f = filters * width
    new = max(divisor, int(f + divisor / 2) // divisor * divisor)
    if new < 0.9 * f:
        new += divisor
    return int(new)


def _round_repeats(repeats: int, depth: float) -> int:
    return int(np.ceil(depth * repeats))


class EfficientNetBackbone(nn.Module):
    """Faithful EfficientNet (squeeze-excite, swish, compound scaling),
    stride 32 — the architecture of the reference's default backbone
    (keras ``EfficientNetB4(include_top=False, weights=None)``, reference
    backbone.py:28-31). ``width=1.4, depth=1.8`` are the B4 coefficients;
    the param count is pinned against keras B4's published 17,673,823
    (tests/test_efficientnet_b4.py).

    TPU note: depthwise convs are HBM-bandwidth-bound on the MXU, so this
    exists for architecture parity and quality comparison;
    ``efficientnet_lite`` (and the ResNet flagship) remain the TPU-first
    recommendations (benchmarks/RESULTS.md)."""

    width: float = 1.4  # B4
    depth: float = 1.8  # B4
    drop_connect_rate: float = 0.2
    norm: str = "batchnorm"
    dtype: jnp.dtype = jnp.float32

    # B0 base: (filters_out, repeats, stride, kernel, expand)
    BASE = ((16, 1, (1, 1), (3, 3), 1),
            (24, 2, (2, 2), (3, 3), 6),
            (40, 2, (2, 2), (5, 5), 6),
            (80, 3, (2, 2), (3, 3), 6),
            (112, 3, (1, 1), (5, 5), 6),
            (192, 4, (2, 2), (5, 5), 6),
            (320, 1, (1, 1), (3, 3), 6))

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = ConvNormAct(_round_filters(32, self.width), (3, 3), (2, 2),
                        norm=self.norm, act=nn.swish, dtype=self.dtype,
                        name="stem")(x, train=train)
        total = sum(_round_repeats(r, self.depth) for _, r, _, _, _ in
                    self.BASE)
        done = 0
        for s, (feats, repeats, strides, kernel, expand) in enumerate(
                self.BASE):
            feats = _round_filters(feats, self.width)
            for i in range(_round_repeats(repeats, self.depth)):
                x = MBConvSEBlock(
                    feats, expand, kernel, strides if i == 0 else (1, 1),
                    se_ratio=0.25,
                    drop_rate=self.drop_connect_rate * done / total,
                    norm=self.norm, dtype=self.dtype,
                    name=f"stage{s}_block{i}")(x, train=train)
                done += 1
        x = ConvNormAct(_round_filters(1280, self.width), (1, 1),
                        norm=self.norm, act=nn.swish, dtype=self.dtype,
                        name="head")(x, train=train)
        return x


class ViTBlock(nn.Module):
    """Standard pre-LN transformer block (attention + 4x-GELU MLP).

    Residual stream kept in f32 (cheap at token scale); matmuls run in the
    compute dtype with f32 softmax/accumulation via MultiheadAttention."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32
    mlp_ratio: int = 4
    use_pallas: bool = False
    qk_norm: bool = False

    @nn.compact
    def __call__(self, x):  # x: f32 [B, T, D]
        d = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="ln1")(x)
        h = MultiheadAttention(self.num_heads, dtype=self.dtype,
                               post_softmax_mask=False,
                               use_pallas=self.use_pallas,
                               qk_norm=self.qk_norm, name="attn")(
                                   h.astype(self.dtype), h.astype(self.dtype),
                                   h.astype(self.dtype))
        x = x + h.astype(jnp.float32)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="ln2")(x)
        h = nn.Dense(self.mlp_ratio * d, dtype=self.dtype,
                     name="mlp_in")(h.astype(self.dtype))
        h = nn.gelu(h)
        h = nn.Dense(d, dtype=self.dtype, name="mlp_out")(h)
        return x + h.astype(jnp.float32)


class ViTBackbone(nn.Module):
    """Pre-LN ViT encoder as a stride-32 detection backbone — a TPU-first
    extension beyond the reference (which offers only CNN backbones,
    reference backbone.py:28-39).

    Rationale: profiling shows the BN-ResNet flagship is HBM-roofline-bound
    by stage-1/2 BatchNorm activation traffic at 160x160 (~11.5 ms of a
    27.8 ms 640px/bs8 step; benchmarks/RESULTS.md), which no amount of
    scheduling removes. A ViT moves the same capacity into large dense
    matmuls that run near MXU peak, has no BatchNorm at any resolution, and
    its patchify embedding touches the 640px input exactly once.

    Standard ViT (Dosovitskiy et al.) with learned positional embeddings
    (trig-initialized like the DETR encoder's); this component has no
    reference counterpart to stay bit-faithful to. Output honors the shared
    stride-32 grid contract: when ``patch < 32`` a strided conv reduces the
    token grid to (H/32, W/32) with 2x the embedding width (mirroring CNN
    channel doubling), so the neck and DETR encoder are unchanged."""

    dim: int = 384
    depth: int = 8
    num_heads: int = 6
    patch: int = 16
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    qk_norm: bool = False
    pallas_stem: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False, preprocess=None):
        assert self.dim % self.num_heads == 0, (self.dim, self.num_heads)
        assert 32 % self.patch == 0, f"patch {self.patch} must divide 32"
        b = x.shape[0]
        if self.pallas_stem:
            # fused patchify kernel; param tree mirrors nn.Conv exactly
            x = PallasPatchifyConv(self.dim, self.patch, use_bias=True,
                                   dtype=self.dtype,
                                   name="patch_embed")(x, preprocess)
        else:
            assert preprocess is None
            x = nn.Conv(self.dim, (self.patch, self.patch),
                        (self.patch, self.patch), padding="VALID",
                        dtype=self.dtype, name="patch_embed")(x)
        gh, gw = x.shape[1], x.shape[2]
        t = gh * gw
        x = x.reshape(b, t, self.dim).astype(jnp.float32)
        pos = self.param(
            "positional_embedding",
            lambda key, shape: jnp.asarray(trig_positional_init(t, self.dim)),
            (t, self.dim))
        x = x + pos[None]
        for i in range(self.depth):
            x = ViTBlock(self.num_heads, self.dtype,
                         use_pallas=self.use_pallas, qk_norm=self.qk_norm,
                         name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="ln_final")(x)
        x = x.reshape(b, gh, gw, self.dim).astype(self.dtype)
        if self.patch < 32:
            r = 32 // self.patch
            x = nn.Conv(2 * self.dim, (r, r), (r, r), padding="VALID",
                        dtype=self.dtype, name="reduce")(x)
        return x


def parse_vit_spec(backbone: str, width: float
                   ) -> Tuple[int, int, int, int, bool]:
    """Parse a ``vit[_pP][_dD][_wW][_hH][_qk]`` backbone string into
    (dim, depth, heads, patch, qk_norm). Defaults: ViT-Small-ish d384/
    8 blocks/6 heads/patch 16; ``width`` scales the embedding dim; the
    ``qk`` token enables per-head QK-norm (spike stabilizer)."""
    dim, depth, heads, patch = 384, 8, 6, 16
    qk_norm = False
    for tok in backbone.split("_")[1:]:
        if tok == "qk":
            qk_norm = True
            continue
        if len(tok) < 2 or tok[0] not in "pdwh" or not tok[1:].isdigit():
            raise ValueError(f"bad vit spec token '{tok}' in '{backbone}' "
                             "(expected p<patch>/d<depth>/w<dim>/h<heads>"
                             "/qk)")
        kind, val = tok[0], int(tok[1:])
        if kind == "p":
            patch = val
        elif kind == "d":
            depth = val
        elif kind == "w":
            dim = val
        else:
            heads = val
    return int(dim * width), depth, heads, patch, qk_norm


class TinyBackbone(nn.Module):
    """Minimal stride-32 conv stack for tests and the BASELINE config-#1
    'small backbone' slice."""

    width: float = 1.0
    norm: str = "batchnorm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = max(8, int(32 * self.width))
        for i in range(5):  # 2^5 = stride 32
            x = ConvNormAct(min(feats * 2 ** i, 256), (3, 3), (2, 2),
                            norm=self.norm, dtype=self.dtype,
                            name=f"conv{i}")(x, train=train)
        return x


def _preprocess_affine(mode: str):
    """The input-handling modes of ``EncoderBackbone`` expressed as a
    per-channel affine ``a * x[..., perm] + b`` over the clipped [0,1]
    image — the form ``PallasPatchifyConv`` folds into the stem weights."""
    if mode == "scale":
        return [2.0] * 3, [-1.0] * 3, None
    if mode == "imagenet":
        mean = np.asarray([0.485, 0.456, 0.406])
        std = np.asarray([0.229, 0.224, 0.225])
        return list(1.0 / std), list(-mean / std), None
    if mode == "caffe":
        return [255.0] * 3, [-103.939, -116.779, -123.68], [2, 1, 0]
    raise ValueError(f"unknown preprocessing '{mode}'")


class EncoderBackbone(nn.Module):
    """Input handling + CNN (reference backbone.py:15-58): images arrive in
    [0,1], are clipped, and scaled to the CNN's expected range. The reference
    resizes to ``image_size`` inside the model; here resizing is the data
    pipeline's job (static shapes under jit), and we only assert it."""

    backbone: str = "resnet"
    width: float = 1.0
    norm: str = "batchnorm"
    dtype: jnp.dtype = jnp.float32
    stem: str = "conv7"
    preprocessing: str = "scale"
    use_pallas: bool = False  # fused-attention kernel for ViT blocks
    use_pallas_stem: bool = False  # fused patchify-stem kernel (ResNet)

    @nn.compact
    def __call__(self, image, *, train: bool = False):
        is_vit = (self.backbone == "vit"
                  or self.backbone.startswith("vit_"))
        if self.use_pallas_stem and (is_vit or (
                self.backbone == "resnet"
                and self.stem.startswith("patchify"))):
            # fused stem: the RAW f32 image goes straight to the Pallas
            # kernel — clip happens in VMEM and the preprocessing affine
            # is folded into the stem weights, so no preprocessed 640px
            # tensor (f32 OR bf16) is ever materialized in HBM.
            a, b, perm = _preprocess_affine(self.preprocessing)
            pre = (jnp.asarray(a, jnp.float32),
                   jnp.asarray(b, jnp.float32), perm, True)
            if is_vit:
                dim, depth, heads, patch, qk_norm = parse_vit_spec(
                    self.backbone, self.width)
                net = ViTBackbone(dim, depth, heads, patch, self.dtype,
                                  use_pallas=self.use_pallas,
                                  qk_norm=qk_norm, pallas_stem=True,
                                  name="vit")
            else:
                net = ResNetBackbone(self.width, norm=self.norm,
                                     dtype=self.dtype, stem=self.stem,
                                     pallas_stem=True, name="resnet")
            return net(image.astype(jnp.float32), train=train,
                       preprocess=pre)
        x = jnp.clip(image.astype(jnp.float32), 0.0, 1.0)
        if self.preprocessing == "scale":
            x = x * 2.0 - 1.0  # [-1, 1] (from-scratch default)
        elif self.preprocessing == "imagenet":
            # torch-pretrained parity: RGB mean/std normalize
            mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
            std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
            x = (x - mean) / std
        elif self.preprocessing == "caffe":
            # Keras resnet.preprocess_input parity (reference
            # backbone.py:37-39): 0-255 BGR minus ImageNet channel means
            x = x[..., ::-1] * 255.0
            x = x - jnp.asarray([103.939, 116.779, 123.68], jnp.float32)
        else:
            raise ValueError(
                f"unknown preprocessing '{self.preprocessing}'")
        x = x.astype(self.dtype)
        if self.backbone == "resnet":
            net = ResNetBackbone(self.width, norm=self.norm, dtype=self.dtype,
                                 stem=self.stem, name="resnet")
        elif self.backbone == "efficientnet_lite":
            net = EfficientNetLiteBackbone(self.width, norm=self.norm,
                                           dtype=self.dtype, name="effnet")
        elif self.backbone == "efficientnet_b4":
            # the reference's literal default architecture (keras B4 from
            # scratch, reference backbone.py:28-31); ``width`` multiplies
            # the B4 width coefficient
            net = EfficientNetBackbone(1.4 * self.width, 1.8,
                                       norm=self.norm, dtype=self.dtype,
                                       name="effnet_b4")
        elif self.backbone == "tiny":
            net = TinyBackbone(self.width, norm=self.norm, dtype=self.dtype,
                               name="tiny")
        elif self.backbone == "vit" or self.backbone.startswith("vit_"):
            # (exact-prefix match: a typo like "vitp32" must error below,
            # not silently train the default ViT)
            dim, depth, heads, patch, qk_norm = parse_vit_spec(self.backbone,
                                                               self.width)
            net = ViTBackbone(dim, depth, heads, patch, self.dtype,
                              use_pallas=self.use_pallas, qk_norm=qk_norm,
                              name="vit")
        else:
            raise ValueError(f"unknown backbone '{self.backbone}'")
        return net(x, train=train)


class BackboneNeck(nn.Module):
    """BatchNorm -> 1x1 conv (tanh, lecun_normal) to encoder_dim -> BatchNorm
    (reference backbone.py:66-95)."""

    encoder_dim: int
    norm: str = "batchnorm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, *, train: bool = False):
        # skipinit backbones still need conditioning before the tanh: use
        # GroupNorm here (the neck's 20x20 activations are tiny — the BN
        # traffic being designed out lives at 80x80/40x40, not here)
        norm = "groupnorm" if self.norm == "skipinit" else self.norm
        x = make_norm(norm, train, self.dtype, "norm1")(features)
        x = nn.Conv(self.encoder_dim, (1, 1),
                    kernel_init=nn.initializers.lecun_normal(),
                    dtype=self.dtype, name="conv")(x)
        x = jnp.tanh(x)
        x = make_norm(norm, train, self.dtype, "norm2")(x)
        return x
