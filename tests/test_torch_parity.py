"""Numerical parity of the YOLOv11 translation against plain torch.

torch 2.13 (CPU) is installed in this environment; ultralytics is not and
the reference's released checkpoints are unavailable. The nearest
achievable substitute for checkpoint parity is architectural parity: the
YOLOv11 graph is re-implemented here in plain torch (NCHW, following the
ultralytics architecture: Conv-BN-SiLU, C3k2/C3k/Bottleneck, SPPF,
C2PSA attention, decoupled detect + segment heads, Proto), identical
weights are loaded on both sides — through the SAME state-dict name
mapping convert.py uses for real .pt files — and per-block plus
end-to-end fp32 outputs are compared.

This pins, against an independent implementation:
  - layout transposes (NCHW<->NHWC, OIHW<->HWIO, deconv IOHW)
  - grouped/depthwise conv semantics, autopad, stride-2 downsampling
  - BatchNorm eval semantics (eps=1e-3) and running-stat mapping
  - SPPF pooling, nearest upsample, attention einsum order
  - convert.py's torch-name -> flax-path mapping on every layer
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from eitx.models.yolo.blocks import C3k2, Conv, SPPF  # noqa: E402
from eitx.models.yolo.convert import convert_state_to_variables  # noqa: E402
from eitx.models.yolo.model import YoloV11, yolov11_spec  # noqa: E402


def autopad(k):
    return k // 2


class TConv(tnn.Module):
    """ultralytics Conv: Conv2d(bias=False) + BatchNorm2d(eps=1e-3) + SiLU."""

    def __init__(self, c1, c2, k=1, s=1, g=1, act=True):
        super().__init__()
        self.conv = tnn.Conv2d(c1, c2, k, s, autopad(k), groups=g, bias=False)
        self.bn = tnn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = tnn.SiLU() if act else tnn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TBottleneck(tnn.Module):
    def __init__(self, c1, c2, shortcut=True, g=1, k=(3, 3), e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, k[0], 1)
        self.cv2 = TConv(c_, c2, k[1], 1, g=g)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC3k(tnn.Module):
    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5, k=3):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, 1, 1)
        self.cv2 = TConv(c1, c_, 1, 1)
        self.cv3 = TConv(2 * c_, c2, 1)
        self.m = tnn.Sequential(
            *(TBottleneck(c_, c_, shortcut, g, k=(k, k), e=1.0)
              for _ in range(n))
        )

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class TC3k2(tnn.Module):
    def __init__(self, c1, c2, n=1, c3k=False, e=0.5, g=1, shortcut=True):
        super().__init__()
        self.c = int(c2 * e)
        self.cv1 = TConv(c1, 2 * self.c, 1, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1)
        self.m = tnn.ModuleList(
            TC3k(self.c, self.c, 2, shortcut, g) if c3k
            else TBottleneck(self.c, self.c, shortcut, g, k=(3, 3), e=1.0)
            for _ in range(n)
        )

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class TSPPF(tnn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1, 1)
        self.cv2 = TConv(c_ * 4, c2, 1, 1)
        self.m = tnn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class TAttention(tnn.Module):
    def __init__(self, dim, num_heads=8, attn_ratio=0.5):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.key_dim = int(self.head_dim * attn_ratio)
        self.scale = self.key_dim**-0.5
        nh_kd = self.key_dim * num_heads
        h = dim + nh_kd * 2
        self.qkv = TConv(dim, h, 1, act=False)
        self.proj = TConv(dim, dim, 1, act=False)
        self.pe = TConv(dim, dim, 3, 1, g=dim, act=False)

    def forward(self, x):
        B, C, H, W = x.shape
        N = H * W
        qkv = self.qkv(x)
        q, k, v = qkv.view(
            B, self.num_heads, self.key_dim * 2 + self.head_dim, N
        ).split([self.key_dim, self.key_dim, self.head_dim], dim=2)
        attn = (q.transpose(-2, -1) @ k) * self.scale
        attn = attn.softmax(dim=-1)
        x = (v @ attn.transpose(-2, -1)).view(B, C, H, W) + self.pe(
            v.reshape(B, C, H, W)
        )
        return self.proj(x)


class TPSABlock(tnn.Module):
    def __init__(self, c, attn_ratio=0.5, num_heads=4):
        super().__init__()
        self.attn = TAttention(c, num_heads=num_heads, attn_ratio=attn_ratio)
        self.ffn = tnn.Sequential(
            TConv(c, c * 2, 1), TConv(c * 2, c, 1, act=False)
        )

    def forward(self, x):
        x = x + self.attn(x)
        return x + self.ffn(x)


class TC2PSA(tnn.Module):
    def __init__(self, c1, c2, n=1, e=0.5):
        super().__init__()
        self.c = int(c2 * e)
        self.cv1 = TConv(c1, 2 * self.c, 1, 1)
        self.cv2 = TConv(2 * self.c, c2, 1)
        self.m = tnn.Sequential(
            *(TPSABlock(self.c, attn_ratio=0.5,
                        num_heads=max(1, self.c // 64)) for _ in range(n))
        )

    def forward(self, x):
        a, b = self.cv1(x).split((self.c, self.c), dim=1)
        b = self.m(b)
        return self.cv2(torch.cat((a, b), 1))


class TProto(tnn.Module):
    def __init__(self, c1, c_=256, c2=32):
        super().__init__()
        self.cv1 = TConv(c1, c_, k=3)
        self.upsample = tnn.ConvTranspose2d(c_, c_, 2, 2, 0, bias=True)
        self.cv2 = TConv(c_, c_, k=3)
        self.cv3 = TConv(c_, c2)

    def forward(self, x):
        return self.cv3(self.cv2(self.upsample(self.cv1(x))))


class TSegmentHead(tnn.Module):
    """v11 decoupled Detect + Segment head (module names match the
    ultralytics state dict: cv2/cv3/cv4/proto)."""

    def __init__(self, nc, ch, reg_max=16, nm=32, npr=256, segment=True):
        super().__init__()
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.segment = segment
        self.cv2 = tnn.ModuleList(
            tnn.Sequential(
                TConv(x, c2, 3), TConv(c2, c2, 3),
                tnn.Conv2d(c2, 4 * reg_max, 1),
            )
            for x in ch
        )
        self.cv3 = tnn.ModuleList(
            tnn.Sequential(
                tnn.Sequential(TConv(x, x, 3, g=x), TConv(x, c3, 1)),
                tnn.Sequential(TConv(c3, c3, 3, g=c3), TConv(c3, c3, 1)),
                tnn.Conv2d(c3, nc, 1),
            )
            for x in ch
        )
        if segment:
            c4 = max(ch[0] // 4, nm)
            self.cv4 = tnn.ModuleList(
                tnn.Sequential(
                    TConv(x, c4, 3), TConv(c4, c4, 3), tnn.Conv2d(c4, nm, 1)
                )
                for x in ch
            )
            self.proto = TProto(ch[0], npr, nm)

    def forward(self, feats):
        boxes = [m(f) for m, f in zip(self.cv2, feats)]
        clss = [m(f) for m, f in zip(self.cv3, feats)]
        if not self.segment:
            return boxes, clss, None, None
        coefs = [m(f) for m, f in zip(self.cv4, feats)]
        return boxes, clss, coefs, self.proto(feats[0])


class TYolo11Seg(tnn.Module):
    """Full yolo11-seg graph with state-dict names model.0 ... model.23."""

    def __init__(self, variant="n", nc=4, segment=True):
        super().__init__()
        scales = {"n": (0.50, 0.25, 1024), "s": (0.50, 0.50, 1024)}
        d, w, mc = scales[variant]
        ch = lambda c: int(min(c, mc) * w)  # noqa: E731
        n = max(1, round(2 * d))
        h = ch(512) // 2  # C3k2 hidden after cat — unused, clarity only
        del h
        layers = [
            TConv(3, ch(64), 3, 2),                       # 0
            TConv(ch(64), ch(128), 3, 2),                 # 1
            TC3k2(ch(128), ch(256), n, False, e=0.25),    # 2
            TConv(ch(256), ch(256), 3, 2),                # 3
            TC3k2(ch(256), ch(512), n, False, e=0.25),    # 4
            TConv(ch(512), ch(512), 3, 2),                # 5
            TC3k2(ch(512), ch(512), n, True),             # 6
            TConv(ch(512), ch(1024), 3, 2),               # 7
            TC3k2(ch(1024), ch(1024), n, True),           # 8
            TSPPF(ch(1024), ch(1024), 5),                 # 9
            TC2PSA(ch(1024), ch(1024), n),                # 10
            tnn.Upsample(scale_factor=2, mode="nearest"),  # 11
            tnn.Identity(),                                # 12 (concat)
            TC3k2(ch(1024) + ch(512), ch(512), n, False),  # 13
            tnn.Upsample(scale_factor=2, mode="nearest"),  # 14
            tnn.Identity(),                                # 15 (concat)
            TC3k2(ch(512) + ch(512), ch(256), n, False),   # 16
            TConv(ch(256), ch(256), 3, 2),                 # 17
            tnn.Identity(),                                # 18 (concat)
            TC3k2(ch(256) + ch(512), ch(512), n, False),   # 19
            TConv(ch(512), ch(512), 3, 2),                 # 20
            tnn.Identity(),                                # 21 (concat)
            TC3k2(ch(512) + ch(1024), ch(1024), n, True),  # 22
            TSegmentHead(
                nc, (ch(256), ch(512), ch(1024)),
                npr=int(256 * w), segment=segment,
            ),                                             # 23
        ]
        self.model = tnn.ModuleList(layers)

    def forward(self, x):
        m = self.model
        y0 = m[0](x)
        y1 = m[1](y0)
        y2 = m[2](y1)
        y3 = m[3](y2)
        y4 = m[4](y3)
        y5 = m[5](y4)
        y6 = m[6](y5)
        y7 = m[7](y6)
        y8 = m[8](y7)
        y9 = m[9](y8)
        y10 = m[10](y9)
        y13 = m[13](torch.cat([m[11](y10), y6], 1))
        y16 = m[16](torch.cat([m[14](y13), y4], 1))
        y19 = m[19](torch.cat([m[17](y16), y13], 1))
        y22 = m[22](torch.cat([m[20](y19), y10], 1))
        return m[23]((y16, y19, y22))


# ------------------------------------------------------------------ helpers
def _randomize(module, seed=0):
    """Random weights AND random (valid) BN running stats so the stat
    mapping is exercised, not hidden behind zeros/ones."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for name, b in module.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.05)
            elif name.endswith("running_var"):
                b.copy_(1.0 + 0.3 * torch.rand(b.shape, generator=g))
    module.eval()
    return module


def _state_numpy(module):
    return {
        k: v.detach().numpy().astype(np.float32)
        for k, v in module.state_dict().items()
    }


def _to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _block_variables(tmod, flax_mod, x_nhwc, prefix):
    """Transfer a single torch block's weights into a flax block through
    convert.py's mapping (prefixed as a fake one-layer model)."""
    state = {f"{prefix}.{k}": v for k, v in _state_numpy(tmod).items()}
    template = flax_mod.init(jax.random.PRNGKey(0), jnp.asarray(x_nhwc))
    template = jax.tree_util.tree_map(np.asarray, jax.device_get(template))

    def to_mutable(t):
        if hasattr(t, "items"):
            return {k: to_mutable(v) for k, v in t.items()}
        return t

    # wrap the template under the fake prefix so paths line up
    wrapped = {
        key: {prefix: to_mutable(tree)} for key, tree in template.items()
    }
    out = convert_state_to_variables(state, wrapped)
    return {key: tree[prefix] for key, tree in out.items()}


def _assert_close(a, b, tol, what):
    a, b = np.asarray(a), np.asarray(b)
    d = np.abs(a - b).max()
    denom = max(np.abs(b).max(), 1e-3)
    assert d <= tol * max(1.0, denom), f"{what}: max dev {d} (ref {denom})"


BLOCKS = [
    ("conv_bn_silu", lambda: TConv(8, 16, 3, 2), lambda: Conv(16, 3, 2), 8),
    ("dwconv", lambda: TConv(8, 8, 3, g=8), lambda: Conv(8, 3, g=8), 8),
    (
        "c3k2_plain",
        lambda: TC3k2(8, 16, 1, False),
        lambda: C3k2(16, 1, False),
        8,
    ),
    (
        "c3k2_c3k",
        lambda: TC3k2(16, 16, 1, True),
        lambda: C3k2(16, 1, True),
        16,
    ),
    ("sppf", lambda: TSPPF(16, 16, 5), lambda: SPPF(16, 5), 16),
]


@pytest.mark.parametrize("name,tfac,ffac,cin", BLOCKS, ids=[b[0] for b in BLOCKS])
def test_block_parity(name, tfac, ffac, cin):
    tmod = _randomize(tfac(), seed=hash(name) % 1000)
    rng = np.random.default_rng(5)
    x = rng.normal(0, 1, (2, 16, 16, cin)).astype(np.float32)
    fmod = ffac()
    variables = _block_variables(tmod, fmod, x, "blk")
    with torch.no_grad():
        want = _to_nhwc(tmod(torch.from_numpy(x.transpose(0, 3, 1, 2))))
    got = np.asarray(fmod.apply(variables, jnp.asarray(x), train=False))
    _assert_close(got, want, 1e-5, name)


def _block_variables_prefixless(tmod, fmod, x):
    return _block_variables(tmod, fmod, x, "blk")


def test_full_network_parity_segment():
    """End-to-end: full yolo11n-seg torch graph vs the flax graph with
    identical weights through convert.py's real name mapping."""
    tnet = _randomize(TYolo11Seg("n", nc=4, segment=True), seed=7)
    state = _state_numpy(tnet)

    spec = yolov11_spec("n", nc=4, segment=True)
    fnet = YoloV11(spec)
    rng = np.random.default_rng(11)
    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    template = fnet.init(jax.random.PRNGKey(0), jnp.asarray(x))
    template = jax.tree_util.tree_map(np.asarray, jax.device_get(template))

    def to_mutable(t):
        if hasattr(t, "items"):
            return {k: to_mutable(v) for k, v in t.items()}
        return t

    variables = convert_state_to_variables(
        state, {k: to_mutable(v) for k, v in template.items()}
    )
    out = fnet.apply(variables, jnp.asarray(x), train=False)

    with torch.no_grad():
        boxes, clss, coefs, proto = tnet(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        )
    for i, (bf, cf) in enumerate(out["levels"]):
        _assert_close(bf, _to_nhwc(boxes[i]), 2e-5, f"box level {i}")
        _assert_close(cf, _to_nhwc(clss[i]), 2e-5, f"cls level {i}")
    for i, mf in enumerate(out["mask_coefs"]):
        _assert_close(mf, _to_nhwc(coefs[i]), 2e-5, f"coef level {i}")
    _assert_close(out["proto"], _to_nhwc(proto), 2e-5, "proto")


def test_full_network_parity_detect_only():
    """Detect-only variant (the rib model architecture)."""
    tnet = _randomize(TYolo11Seg("n", nc=1, segment=False), seed=3)
    state = _state_numpy(tnet)
    spec = yolov11_spec("n", nc=1, segment=False)
    fnet = YoloV11(spec)
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    template = fnet.init(jax.random.PRNGKey(0), jnp.asarray(x))
    template = jax.tree_util.tree_map(np.asarray, jax.device_get(template))

    def to_mutable(t):
        if hasattr(t, "items"):
            return {k: to_mutable(v) for k, v in t.items()}
        return t

    variables = convert_state_to_variables(
        state, {k: to_mutable(v) for k, v in template.items()}
    )
    out = fnet.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        boxes, clss, _, _ = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for i, (bf, cf) in enumerate(out["levels"]):
        _assert_close(bf, _to_nhwc(boxes[i]), 2e-5, f"box level {i}")
        _assert_close(cf, _to_nhwc(clss[i]), 2e-5, f"cls level {i}")
