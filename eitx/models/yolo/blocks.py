"""YOLOv11 building blocks in flax.linen (NHWC, TPU layout).

Module structure and naming mirror the ultralytics definitions
(Conv/Bottleneck/C3k/C3k2/SPPF/C2PSA/Attention) so the released ``.pt``
checkpoints used by the reference (kt_service_config.py:1-3) map onto the
parameter tree mechanically (see convert.py). Convolutions run in NHWC with
HWIO kernels — XLA's native TPU layout — instead of torch's NCHW/OIHW.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def autopad(k: int, d: int = 1) -> int:
    if d > 1:
        k = d * (k - 1) + 1
    return k // 2


class Conv(nn.Module):
    """Conv2d + BatchNorm + SiLU (ultralytics Conv)."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    d: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = autopad(self.k, self.d)
        x = nn.Conv(
            features=self.c2,
            kernel_size=(self.k, self.k),
            strides=(self.s, self.s),
            padding=((p, p), (p, p)),
            feature_group_count=self.g,
            kernel_dilation=(self.d, self.d),
            use_bias=False,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.97,
            epsilon=1e-3,
            name="bn",
        )(x)
        return nn.silu(x) if self.act else x


class Bottleneck(nn.Module):
    c2: int
    shortcut: bool = True
    g: int = 1
    k: Tuple[int, int] = (3, 3)
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c_, self.k[0], 1, name="cv1")(x, train)
        y = Conv(self.c2, self.k[1], 1, g=self.g, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


class C3k(nn.Module):
    """CSP bottleneck with 3 convs, kxk bottlenecks (ultralytics C3k)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    k: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1, name="cv1")(x, train)
        b = Conv(c_, 1, 1, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck(
                c_, self.shortcut, self.g, k=(self.k, self.k), e=1.0,
                name=f"m_{i}",
            )(a, train)
        return Conv(self.c2, 1, name="cv3")(
            jnp.concatenate([a, b], axis=-1), train
        )


class C3k2(nn.Module):
    """C2f whose inner blocks are C3k (c3k=True) or Bottleneck."""

    c2: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    g: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            if self.c3k:
                m = C3k(c, 2, self.shortcut, self.g, name=f"m_{i}")
            else:
                # C2f bottlenecks run at full hidden width (ultralytics
                # passes e=1.0 here; 0.5 would halve cv1 and break
                # checkpoint shape compatibility)
                m = Bottleneck(
                    c, self.shortcut, self.g, k=(3, 3), e=1.0, name=f"m_{i}"
                )
            ys.append(m(ys[-1], train))
        return Conv(self.c2, 1, name="cv2")(
            jnp.concatenate(ys, axis=-1), train
        )


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained 5x5 max-pools."""

    c2: int
    k: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = Conv(c_, 1, 1, name="cv1")(x, train)
        p = self.k // 2
        pool = lambda t: nn.max_pool(  # noqa: E731
            t, (self.k, self.k), strides=(1, 1), padding=((p, p), (p, p))
        )
        y1 = pool(y)
        y2 = pool(y1)
        y3 = pool(y2)
        return Conv(self.c2, 1, 1, name="cv2")(
            jnp.concatenate([y, y1, y2, y3], axis=-1), train
        )


class Attention(nn.Module):
    """PSA attention: 1x1 qkv conv, per-head attention over H*W, depthwise
    positional conv on v (ultralytics Attention)."""

    dim: int
    num_heads: int = 8
    attn_ratio: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        head_dim = self.dim // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        scale = key_dim**-0.5
        nh_kd = key_dim * self.num_heads
        h = self.dim + nh_kd * 2
        qkv = Conv(h, 1, act=False, name="qkv")(x, train)  # (B, H, W, h)
        n = H * W
        qkv = qkv.reshape(B, n, self.num_heads, key_dim * 2 + head_dim)
        qkv = qkv.transpose(0, 2, 3, 1)  # (B, heads, ch, N)
        q, k, v = (
            qkv[:, :, :key_dim],
            qkv[:, :, key_dim : 2 * key_dim],
            qkv[:, :, 2 * key_dim :],
        )
        attn = jnp.einsum("bhcn,bhcm->bhnm", q, k) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhcm,bhnm->bhcn", v, attn)  # (B, heads, hd, N)
        out = out.transpose(0, 3, 1, 2).reshape(B, H, W, self.dim)
        vmap = v.transpose(0, 3, 1, 2).reshape(B, H, W, self.dim)
        pe = Conv(self.dim, 3, g=self.dim, act=False, name="pe")(vmap, train)
        return Conv(self.dim, 1, act=False, name="proj")(out + pe, train)


class PSABlock(nn.Module):
    c: int
    attn_ratio: float = 0.5
    num_heads: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + Attention(
            self.c, self.num_heads, self.attn_ratio, name="attn"
        )(x, train)
        y = Conv(self.c * 2, 1, name="ffn_0")(x, train)
        y = Conv(self.c, 1, act=False, name="ffn_1")(y, train)
        return x + y


class C2PSA(nn.Module):
    c2: int
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        for i in range(self.n):
            b = PSABlock(
                c, attn_ratio=0.5, num_heads=max(1, c // 64), name=f"m_{i}"
            )(b, train)
        return Conv(self.c2, 1, name="cv2")(
            jnp.concatenate([a, b], axis=-1), train
        )


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample (torch nn.Upsample(scale=2))."""
    B, H, W, C = x.shape
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)
