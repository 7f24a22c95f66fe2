"""YOLOv11 detect/segment network (flax).

Faithful re-expression of the ultralytics yolo11 graph (yolo11.yaml /
yolo11-seg.yaml) so released checkpoints convert mechanically: backbone
(Conv x2, C3k2, Conv, C3k2, Conv, C3k2, Conv, C3k2, SPPF, C2PSA), PAN head
with two upsample and two downsample fusions, and a decoupled
Detect/Segment head with DFL box regression (reg_max=16). Layer indices in
module names (model_0 ... model_23) match the torch state dict's
``model.N.*`` prefixes.

Outputs are raw per-level feature maps; decoding/NMS live in post.py so
the network itself stays a pure jit-able function.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .blocks import C2PSA, C3k2, Conv, SPPF, upsample2x


@dataclass(frozen=True)
class YoloSpec:
    nc: int = 4  # classes
    reg_max: int = 16
    nm: int = 32  # mask coefficients (segment)
    npr: int = 256  # proto channels base
    # proto mask-grid stride: 4 = ultralytics Proto (P3 + one 2x upsample);
    # 2 adds a second upsample stage — thin structures (bone, fat rims)
    # are resolution-bound at stride 4 (measured: n- and s-capacity tie
    # at the same bone/fat IoU floor), so the extra resolution, not extra
    # width, is the quality lever. Not a reference architecture: eitx
    # extension, recorded in checkpoint meta and adopted on load.
    proto_stride: int = 4
    width: float = 0.50
    depth: float = 0.50
    max_channels: int = 1024
    segment: bool = True

    def ch(self, c: int) -> int:
        return int(min(c, self.max_channels) * self.width)

    def rep(self, n: int) -> int:
        return max(1, round(n * self.depth))


def yolov11_spec(
    variant: str = "s", nc: int = 4, segment: bool = True,
    proto_stride: int = 4,
) -> YoloSpec:
    scales = {
        # depth, width, max_channels (ultralytics yolo11.yaml scales)
        "n": (0.50, 0.25, 1024),
        "s": (0.50, 0.50, 1024),
        "m": (0.50, 1.00, 512),
        "l": (1.00, 1.00, 512),
        "x": (1.00, 1.50, 512),
    }
    d, w, mc = scales[variant]
    if proto_stride not in (2, 4):
        raise ValueError(f"proto_stride must be 2 or 4, got {proto_stride}")
    return YoloSpec(
        nc=nc, width=w, depth=d, max_channels=mc, segment=segment,
        proto_stride=proto_stride,
    )


class DetectBranches(nn.Module):
    """Per-level box / class / (mask) branches + proto."""

    spec: YoloSpec
    ch: Tuple[int, ...]  # input channels per level

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        s = self.spec
        c2 = max(16, self.ch[0] // 4, s.reg_max * 4)
        c3 = max(self.ch[0], min(s.nc, 100))
        outs = []
        for i, x in enumerate(feats):
            box = Conv(c2, 3, name=f"cv2_{i}_0")(x, train)
            box = Conv(c2, 3, name=f"cv2_{i}_1")(box, train)
            box = nn.Conv(4 * s.reg_max, (1, 1), name=f"cv2_{i}_2")(box)
            # cls branch: (DWConv + 1x1) x2 + 1x1 (v11 decoupled-lite head)
            c_in = x.shape[-1]
            y = Conv(c_in, 3, g=c_in, name=f"cv3_{i}_0_0")(x, train)
            y = Conv(c3, 1, name=f"cv3_{i}_0_1")(y, train)
            y = Conv(c3, 3, g=c3, name=f"cv3_{i}_1_0")(y, train)
            y = Conv(c3, 1, name=f"cv3_{i}_1_1")(y, train)
            cls = nn.Conv(s.nc, (1, 1), name=f"cv3_{i}_2")(y)
            outs.append((box, cls))

        masks = None
        proto = None
        if s.segment:
            c4 = max(self.ch[0] // 4, s.nm)
            mouts = []
            for i, x in enumerate(feats):
                m = Conv(c4, 3, name=f"cv4_{i}_0")(x, train)
                m = Conv(c4, 3, name=f"cv4_{i}_1")(m, train)
                m = nn.Conv(s.nm, (1, 1), name=f"cv4_{i}_2")(m)
                mouts.append(m)
            masks = mouts
            # Proto on the P3 feature
            c_ = int(s.npr * s.width)
            p = Conv(c_, 3, name="proto_cv1")(feats[0], train)
            # transpose_kernel=True matches torch ConvTranspose2d semantics
            p = nn.ConvTranspose(
                c_, (2, 2), strides=(2, 2), transpose_kernel=True,
                name="proto_upsample",
            )(p)
            p = Conv(c_, 3, name="proto_cv2")(p, train)
            if s.proto_stride == 2:
                # second upsample stage (eitx extension, see YoloSpec):
                # half the channels at 4x the pixels keeps the stage
                # cheaper than the stride-4 trunk it follows
                c2_ = max(c_ // 2, s.nm)
                p = nn.ConvTranspose(
                    c2_, (2, 2), strides=(2, 2), transpose_kernel=True,
                    name="proto_upsample2",
                )(p)
                p = Conv(c2_, 3, name="proto_cv2b")(p, train)
            proto = Conv(s.nm, 1, name="proto_cv3")(p, train)
        return outs, masks, proto


class YoloV11(nn.Module):
    """Full network; returns dict with per-level raw outputs."""

    spec: YoloSpec = field(default_factory=YoloSpec)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict:
        s = self.spec
        ch = s.ch
        n = s.rep(2)

        # --- backbone ---
        y0 = Conv(ch(64), 3, 2, name="model_0")(x, train)  # P1
        y1 = Conv(ch(128), 3, 2, name="model_1")(y0, train)  # P2
        y2 = C3k2(ch(256), n, False, e=0.25, name="model_2")(y1, train)
        y3 = Conv(ch(256), 3, 2, name="model_3")(y2, train)  # P3
        y4 = C3k2(ch(512), n, False, e=0.25, name="model_4")(y3, train)
        y5 = Conv(ch(512), 3, 2, name="model_5")(y4, train)  # P4
        y6 = C3k2(ch(512), n, True, name="model_6")(y5, train)
        y7 = Conv(ch(1024), 3, 2, name="model_7")(y6, train)  # P5
        y8 = C3k2(ch(1024), n, True, name="model_8")(y7, train)
        y9 = SPPF(ch(1024), 5, name="model_9")(y8, train)
        y10 = C2PSA(ch(1024), n, name="model_10")(y9, train)

        # --- head (PAN) ---
        u = upsample2x(y10)  # 11
        cat12 = jnp.concatenate([u, y6], axis=-1)
        y13 = C3k2(ch(512), n, False, name="model_13")(cat12, train)
        u = upsample2x(y13)  # 14
        cat15 = jnp.concatenate([u, y4], axis=-1)
        y16 = C3k2(ch(256), n, False, name="model_16")(cat15, train)  # P3
        y17 = Conv(ch(256), 3, 2, name="model_17")(y16, train)
        cat18 = jnp.concatenate([y17, y13], axis=-1)
        y19 = C3k2(ch(512), n, False, name="model_19")(cat18, train)  # P4
        y20 = Conv(ch(512), 3, 2, name="model_20")(y19, train)
        cat21 = jnp.concatenate([y20, y10], axis=-1)
        y22 = C3k2(ch(1024), n, True, name="model_22")(cat21, train)  # P5

        feats = (y16, y19, y22)
        head = DetectBranches(
            s, tuple(f.shape[-1] for f in feats), name="model_23"
        )
        outs, mask_coefs, proto = head(feats, train)
        result = {
            "levels": outs,  # [(box (B,H,W,4*reg_max), cls (B,H,W,nc))]
            "strides": (8, 16, 32),
        }
        if s.segment:
            result["mask_coefs"] = mask_coefs
            result["proto"] = proto
        return result
