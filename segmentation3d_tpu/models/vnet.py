"""V-Net (Milletari et al. 2016) — TPU-native flax implementation.

Capability-parity rebuild of the reference ``segmentation3d/network/vnet.py``
(blocks ``ConvBnRelu3`` ≈L10-30, ``BottConvBnRelu3`` ≈L35-60,
``ResidualBlock3`` ≈L65-95, ``BottResidualBlock3`` ≈L100-125, ``InputBlock``
≈L130-145, ``DownBlock`` ≈L150-175, ``UpBlock`` ≈L180-210, ``OutputBlock``
≈L215-240, ``SegmentationNet`` ≈L245-300, ``max_stride()`` = 16), redesigned
for TPU:

- channels-last ``[B, D, H, W, C]`` layout (XLA's preferred conv layout —
  the channel axis rides the 128-lane dimension),
- conv + BN + activation left to XLA fusion; bf16 compute optional via
  ``dtype`` with f32 params and f32 BN statistics,
- stride-2 2x2x2 convs / transposed convs for down/up sampling (MXU-tiled by
  XLA; no pooling anywhere, matching V-Net).

Architecture (encoder channels 16->256 via 4 stride-2 stages, decoder
mirrors with skip concats; residual conv counts {1,2,3,3} / {3,3,2,1}):
see SURVEY.md §3.3. The output block ends in a **softmax over classes** — the
net emits probabilities, not logits, which the reference's losses and
inference engine rely on.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

KAIMING = nn.initializers.he_normal()


class Conv3d(nn.Module):
    """3D conv with a selectable lowering backend, param-tree-identical to
    ``nn.Conv`` (keys ``kernel``/``bias``, DHWIO) so checkpoints are
    interchangeable regardless of backend.

    Backends (all pure XLA, differentiable — measured on TPU v5e, see
    ``benchmarks/bench_convs.py``):

    - ``direct``: ``lax.conv_general_dilated`` as-is (XLA pads thin Cout to
      the 128-lane MXU width: 0.4-12 TF/s useful on V-Net's thin stages);
    - ``window``: x-window-unfolded GEMM
      (:func:`segmentation3d_tpu.ops.packed_conv.window_conv3d`) — the
      measured best for 3x3x3 stride-1 convs with Cout <= 64.
    """
    features: int
    ksize: int = 3
    dtype: jnp.dtype = jnp.float32
    backend: str = "direct"

    @nn.compact
    def __call__(self, x):
        if self.backend not in ("direct", "window"):
            # 'packed_domain' (and typos) must not silently run direct: the
            # packed-domain forward is selected at the TRAIN-LOOP level
            # (core.seg_train builds models.packed_train.build_packed_train_apply)
            # and never reaches per-conv dispatch.
            raise ValueError(
                f"unknown conv backend {self.backend!r}: Conv3d lowers "
                "'direct' or 'window' ('packed_domain' is a train-loop "
                "selection, see cfg.tpu.conv_backend in core.seg_train)")
        cin = x.shape[-1]
        kernel = self.param("kernel", KAIMING,
                            (self.ksize,) * 3 + (cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        if self.backend == "window" and self.ksize == 3:
            from segmentation3d_tpu.ops.packed_conv import (
                window_conv3d, pick_window_p)
            if pick_window_p(self.features) > 1:
                return window_conv3d(x.astype(self.dtype), kernel, bias,
                                     out_dtype=self.dtype)
        import jax
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return out + bias.astype(out.dtype)


def max_stride() -> int:
    """Total down-sampling factor; crop sizes must be divisible by this."""
    return 16


class ActivationFn(nn.Module):
    """String-selected activation; 'prelu' carries a learned parameter."""
    kind: str = "relu"

    @nn.compact
    def __call__(self, x):
        if self.kind == "relu":
            return nn.relu(x)
        if self.kind == "prelu":
            alpha = self.param("alpha", nn.initializers.constant(0.25), (1,), jnp.float32)
            return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)
        if self.kind == "leaky_relu":
            return nn.leaky_relu(x, 0.01)
        raise ValueError(f"unknown activation {self.kind!r}")


class ConvBnAct(nn.Module):
    """3x3x3 conv + BatchNorm + activation (reference ``ConvBnRelu3``)."""
    features: int
    ksize: int = 3
    act: str = "relu"
    dtype: jnp.dtype = jnp.float32
    backend: str = "direct"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv3d(self.features, self.ksize, self.dtype, self.backend,
                   name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn")(x)
        return ActivationFn(self.act, name="act")(x.astype(self.dtype))


class BottConvBnAct(nn.Module):
    """Bottleneck conv block (reference ``BottConvBnRelu3``): 1x1x1 reduce by
    ``ratio`` -> 3x3x3 -> 1x1x1 expand, each with BN(+act on first two)."""
    features: int
    ratio: int = 4
    act: str = "relu"
    dtype: jnp.dtype = jnp.float32
    backend: str = "direct"

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = max(1, self.features // self.ratio)
        x = ConvBnAct(mid, 1, self.act, self.dtype, self.backend,
                      name="reduce")(x, train)
        x = ConvBnAct(mid, 3, self.act, self.dtype, self.backend,
                      name="conv")(x, train)
        x = nn.Conv(self.features, (1, 1, 1), padding="SAME", kernel_init=KAIMING,
                    dtype=self.dtype, name="expand")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn")(x)
        return x.astype(self.dtype)


class ResidualBlock(nn.Module):
    """Chain of ``num_convs`` conv-BN-act with additive identity:
    ``act(x + convs(x))`` (reference ``ResidualBlock3`` ≈L65-95)."""
    features: int
    num_convs: int
    act: str = "relu"
    bottleneck: bool = False
    dtype: jnp.dtype = jnp.float32
    backend: str = "direct"

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        if self.bottleneck:
            for i in range(self.num_convs):
                h = BottConvBnAct(self.features, 4, self.act, self.dtype,
                                  self.backend, name=f"conv{i}")(h, train)
                if i + 1 < self.num_convs:
                    h = ActivationFn(self.act, name=f"act{i}")(h)
        else:
            for i in range(self.num_convs):
                h = ConvBnAct(self.features, 3, self.act, self.dtype,
                              self.backend, name=f"conv{i}")(h, train)
        return ActivationFn(self.act, name="act_out")(x + h)


class InputBlock(nn.Module):
    """in_channels -> 16 stem (reference ``InputBlock`` ≈L130-145)."""
    features: int = 16
    act: str = "relu"
    dtype: jnp.dtype = jnp.float32
    backend: str = "direct"

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvBnAct(self.features, 3, self.act, self.dtype, self.backend,
                         name="conv")(x, train)


class DownBlock(nn.Module):
    """Stride-2 2x2x2 conv doubling channels + residual block
    (reference ``DownBlock`` ≈L150-175)."""
    features: int
    num_convs: int
    act: str = "relu"
    bottleneck: bool = False
    dtype: jnp.dtype = jnp.float32
    backend: str = "direct"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (2, 2, 2), strides=(2, 2, 2), padding="VALID",
                    kernel_init=KAIMING, dtype=self.dtype, name="down_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="down_bn")(x)
        x = ActivationFn(self.act, name="down_act")(x.astype(self.dtype))
        return ResidualBlock(self.features, self.num_convs, self.act,
                             self.bottleneck, self.dtype, self.backend,
                             name="res")(x, train)


class UpBlock(nn.Module):
    """Stride-2 2x2x2 transposed conv halving channels + encoder-skip concat +
    residual block (reference ``UpBlock`` ≈L180-210)."""
    features: int  # channel count AFTER concat (== incoming channels)
    num_convs: int
    act: str = "relu"
    bottleneck: bool = False
    dtype: jnp.dtype = jnp.float32
    backend: str = "direct"

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        up = self.features // 2
        x = nn.ConvTranspose(up, (2, 2, 2), strides=(2, 2, 2), padding="VALID",
                             kernel_init=KAIMING, dtype=self.dtype, name="up_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="up_bn")(x)
        x = ActivationFn(self.act, name="up_act")(x.astype(self.dtype))
        x = jnp.concatenate([x, skip.astype(self.dtype)], axis=-1)
        return ResidualBlock(self.features, self.num_convs, self.act,
                             self.bottleneck, self.dtype, self.backend,
                             name="res")(x, train)


class OutputBlock(nn.Module):
    """3x3x3 conv -> 1x1x1 conv -> softmax over classes (reference
    ``OutputBlock`` ≈L215-240). Emits **probabilities** in f32."""
    out_channels: int
    act: str = "relu"
    dtype: jnp.dtype = jnp.float32
    backend: str = "direct"

    @nn.compact
    def __call__(self, x, train: bool = False, return_logits: bool = False):
        x = ConvBnAct(self.out_channels, 3, self.act, self.dtype, self.backend,
                      name="conv")(x, train)
        x = nn.Conv(self.out_channels, (1, 1, 1), padding="SAME", kernel_init=KAIMING,
                    dtype=self.dtype, name="proj")(x)
        x = x.astype(jnp.float32)
        return x if return_logits else nn.softmax(x, axis=-1)


class SegmentationNet(nn.Module):
    """V-Net encoder-decoder (reference ``SegmentationNet`` ≈L245-300).

    Input ``[B, D, H, W, in_channels]`` (channels-last), output per-class
    probabilities ``[B, D, H, W, out_channels]`` (softmax applied). D/H/W must
    be divisible by :func:`max_stride`.
    """
    in_channels: int
    out_channels: int
    base_channels: int = 16
    down_convs: Sequence[int] = (1, 2, 3, 3)
    up_convs: Sequence[int] = (3, 3, 2, 1)
    act: str = "relu"
    bottleneck: bool = False
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # checkpoint down/up blocks (training memory)
    conv_backend: str = "direct"  # 'window' = unfolded-GEMM thin convs

    @nn.compact
    def __call__(self, x, train: bool = False, return_logits: bool = False):
        if self.conv_backend not in ("direct", "window"):
            raise ValueError(
                f"unknown conv_backend {self.conv_backend!r} (expected "
                "'direct' or 'window'; 'packed_domain' selects the packed "
                "training forward in core.seg_train, not a module backend)")
        assert x.shape[-1] == self.in_channels, (
            f"expected {self.in_channels} input channels, got {x.shape}")
        x = x.astype(self.dtype)
        c = self.base_channels
        skips = []
        # rematerialization: only block boundaries are saved for backward;
        # block internals (the full-res decoder peak) are recomputed
        Down = nn.remat(DownBlock, static_argnums=(2,)) if self.remat else DownBlock
        Up = nn.remat(UpBlock, static_argnums=(3,)) if self.remat else UpBlock
        x = InputBlock(c, self.act, self.dtype, self.conv_backend,
                       name="in_block")(x, train)
        skips.append(x)
        n_stages = len(self.down_convs)
        for i, nconv in enumerate(self.down_convs):
            c *= 2
            x = Down(c, nconv, self.act, self.bottleneck, self.dtype,
                     self.conv_backend, name=f"down_{c}")(x, train)
            if i + 1 < n_stages:
                skips.append(x)
        for nconv in self.up_convs:
            skip = skips.pop()
            x = Up(c, nconv, self.act, self.bottleneck, self.dtype,
                   self.conv_backend, name=f"up_{c}")(x, skip, train)
            c //= 2
        return OutputBlock(self.out_channels, self.act, self.dtype,
                           self.conv_backend, name="out_block")(x, train,
                                                               return_logits)

    def max_stride(self) -> int:
        return 2 ** len(self.down_convs)


def vnet_focal_init(variables, obj_p: float = 0.01):
    """Focal-loss bias init (reference ``vnet_focal_init`` ≈L322-335).

    Sets the final 1x1x1 conv's bias so object classes start with prior
    probability ``obj_p`` after the softmax: bias = -log((1-p)/p) for object
    classes, 0 for background. Kaiming conv init (``vnet_kaiming_init``
    ≈L305-320) is the module default (:data:`KAIMING`), so no separate helper
    is needed for it.
    """
    import jax
    variables = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy
    params = variables["params"]
    bias = params["out_block"]["proj"]["bias"]
    new_bias = jnp.full_like(bias, -jnp.log((1.0 - obj_p) / obj_p))
    new_bias = new_bias.at[0].set(0.0)  # background class
    params["out_block"]["proj"]["bias"] = new_bias
    return variables
