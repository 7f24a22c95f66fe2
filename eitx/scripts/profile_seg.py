"""Per-stage profile of the serving segmentation graph (round-4 item:
"spend one day inside the 25% segmentation MFU").

Decomposes the fused uint8->labels program into its stages, each timed
as its own compiled program on device-resident inputs, with XLA
cost_analysis FLOPs so the conv share vs the NMS/compose tail is
measured instead of guessed:

  preproc   — cast / scale / channel replicate
  network   — backbone+neck+heads (model.apply), the MXU stage
  decode    — DFL + anchor decode (flat anchors)
  nms       — fixed-budget greedy NMS (the sequential fori_loop tail)
  compose   — proto-res mask composition to label images

Also times the network at a C=4-padded input (MXU lane-padding probe for
the C=3 RGB input) and reports each stage's share of the fused
end-to-end program's device time.

Usage: python -m eitx.scripts.profile_seg [--imgsz 512] [--batch 128]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _time(fn, *args, repeats=5):
    import jax

    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts))


def _flops(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        f = ca.get("flops")
        return float(f) if f else None
    except Exception:
        return None


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--imgsz", type=int, default=512)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--serving", action="store_true",
                   help="profile the resolved serving checkpoint instead "
                        "of the fixed random-init bench graph")
    p.add_argument("--report", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from eitx.core.cache import enable_compilation_cache
    from eitx.models.yolo.infer import TissueSegmenter
    from eitx.models.yolo.post import (
        decode_detections,
        nms_fixed,
        compose_label_image,
        postprocess_segment_labels,
    )

    enable_compilation_cache()
    B, S = args.batch, args.imgsz
    kw = {}
    if args.serving:
        from eitx.core.weights import find_checkpoint

        kw["weights"] = find_checkpoint("tissue", S)
    seg = TissueSegmenter(imgsz=S, max_det=64, dtype="bfloat16", **kw)
    model, variables = seg.model, seg.variables
    cdt = seg.compute_dtype
    imgs = (np.random.default_rng(0).uniform(0, 255, (B, S, S))
            ).astype(np.uint8)
    x_u8 = jnp.asarray(imgs)

    @jax.jit
    def preproc(xu):
        x = xu.astype(cdt) / 255.0
        return jnp.repeat(x[..., None], 3, axis=-1)

    x = preproc(x_u8)

    @jax.jit
    def network(xx):
        return model.apply(variables, xx, train=False)

    out = network(x)

    @jax.jit
    def decode(o):
        return decode_detections(o)

    boxes, scores, classes, coefs = decode(out)

    @jax.jit
    def nms_stage(b, s, c, m):
        def one(bb, ss, cc, mm):
            return nms_fixed(bb, ss, cc, mm, 0.3, 0.45, 64)
        return jax.vmap(one)(b, s, c, m)

    det = nms_stage(boxes, scores, classes, coefs)

    @jax.jit
    def compose(proto, d):
        def one(pp, dd):
            return compose_label_image(
                pp, dd, (S, S), (S // 4, S // 4))
        return jax.vmap(one)(proto, d).astype(jnp.int8)

    fused = seg._segment_labels_fn
    if fused is None:
        seg.segment_labels(imgs)  # builds + compiles the fused program
        fused = seg._segment_labels_fn

    res = {"imgsz": S, "batch": B,
           "graph": "serving" if args.serving else "random-init bench"}
    stages = {
        "preproc": (preproc, (x_u8,)),
        "network": (network, (x,)),
        "decode": (decode, (out,)),
        "nms": (nms_stage, (boxes, scores, classes, coefs)),
        "compose": (compose, (out["proto"], det)),
        "fused_e2e": (fused, (x_u8,)),
    }
    for name, (fn, a) in stages.items():
        t = _time(fn, *a, repeats=args.repeats)
        f = _flops(fn, *a)
        res[name] = {
            "ms": round(1e3 * t, 2),
            "gflops": round(f / 1e9, 2) if f else None,
            "tflops_per_s": round(f / t / 1e12, 2) if f else None,
        }
    fused_ms = res["fused_e2e"]["ms"]
    for name in ("preproc", "network", "decode", "nms", "compose"):
        res[name]["share_of_fused"] = round(res[name]["ms"] / fused_ms, 3)

    # MXU channel-padding probe: C=3 -> C=4 input (lane padding)
    @jax.jit
    def network4(xx4):
        return model.apply(variables, xx4[..., :3], train=False)

    x4 = jnp.concatenate([x, jnp.zeros_like(x[..., :1])], -1)
    res["network_c4_slice_ms"] = round(
        1e3 * _time(network4, x4, repeats=args.repeats), 2
    )
    res["slices_per_sec_fused"] = round(B / (fused_ms / 1e3), 1)
    print(json.dumps(res, indent=1))
    if args.report:
        with open(args.report, "w") as fh:
            json.dump(res, fh, indent=1)


if __name__ == "__main__":
    main()
