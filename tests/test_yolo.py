import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eitx.models.yolo import YoloV11, yolov11_spec
from eitx.models.yolo.post import (
    Detections,
    _dfl,
    _iou_matrix,
    decode_detections,
    nms_fixed,
    process_masks,
    postprocess_segment,
)
from eitx.models.yolo.convert import (
    _flax_path,
    convert_state_to_variables,
)
from eitx.models.yolo.infer import TissueSegmenter, letterbox_params

IMG = 128  # small for test speed


@pytest.fixture(scope="module")
def seg_model():
    spec = yolov11_spec("n", nc=4, segment=True)
    model = YoloV11(spec)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    )
    return model, variables


def test_forward_shapes(seg_model):
    model, variables = seg_model
    out = model.apply(variables, jnp.zeros((2, IMG, IMG, 3)), train=False)
    assert out["strides"] == (8, 16, 32)
    (b0, c0), (b1, c1), (b2, c2) = out["levels"]
    assert b0.shape == (2, IMG // 8, IMG // 8, 64)
    assert c0.shape == (2, IMG // 8, IMG // 8, 4)
    assert b2.shape == (2, IMG // 32, IMG // 32, 64)
    assert out["proto"].shape == (2, IMG // 4, IMG // 4, 32)
    assert out["mask_coefs"][0].shape == (2, IMG // 8, IMG // 8, 32)


def test_dfl_expectation():
    # logits peaked at bin 3 -> distance ~3
    logits = np.full((1, 4, 16), -10.0)
    logits[:, :, 3] = 10.0
    d = np.asarray(_dfl(jnp.asarray(logits.reshape(1, 64)), 16))
    assert np.allclose(d, 3.0, atol=1e-3)


def test_decode_box_geometry():
    # one level, 2x2 map, uniform distances -> boxes centered on anchors
    reg_max = 16
    box_map = np.full((1, 2, 2, 4 * reg_max), -10.0, np.float32)
    # peak at bin 2 for all 4 distances
    box_map.reshape(1, 2, 2, 4, reg_max)[..., 2] = 10.0
    cls_map = np.full((1, 2, 2, 3), -5.0, np.float32)
    cls_map[0, 0, 1, 2] = 5.0  # strong class-2 at cell (y=0, x=1)
    out = {"levels": [(jnp.asarray(box_map), jnp.asarray(cls_map))],
           "strides": (8,)}
    boxes, scores, classes, _ = decode_detections(out, reg_max)
    # anchor (x=1.5, y=0.5) stride 8: box = (1.5-2, 0.5-2, 1.5+2, 0.5+2)*8
    i = 1  # flat index y=0, x=1
    assert np.allclose(np.asarray(boxes)[0, i], [-4, -12, 28, 20])
    assert np.asarray(classes)[0, i] == 2
    assert np.asarray(scores)[0, i] > 0.99


def test_iou_matrix():
    boxes = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                        jnp.float32)
    m = np.asarray(_iou_matrix(boxes))
    assert np.isclose(m[0, 0], 1.0)
    assert np.isclose(m[0, 1], 25 / 175, atol=1e-5)
    assert m[0, 2] == 0.0


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30], [2, 2, 12, 12]],
        jnp.float32,
    )
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.2])
    classes = jnp.asarray([0, 0, 0, 0], jnp.int32)
    coefs = jnp.zeros((4, 2))
    det = nms_fixed(boxes, scores, classes, coefs, conf=0.3,
                    iou_thresh=0.45, max_det=4)
    v = np.asarray(det.valid)
    s = np.asarray(det.scores)
    assert v.sum() == 2  # 0.9 box, 20-30 box; 0.8 suppressed; 0.2 below conf
    assert np.allclose(sorted(s[v].tolist()), [0.7, 0.9], atol=1e-5)
    # different class -> not suppressed
    classes2 = jnp.asarray([0, 1, 0, 0], jnp.int32)
    det2 = nms_fixed(boxes, scores, classes2, coefs, 0.3, 0.45, 4)
    assert np.asarray(det2.valid).sum() == 3


def test_nms_per_class_conf():
    """Tuple conf applies per-class thresholds; a scalar-equivalent tuple
    is bit-identical to the scalar path (reference conf-0.3 parity)."""
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [20, 20, 30, 30], [40, 40, 50, 50]], jnp.float32
    )
    scores = jnp.asarray([0.25, 0.25, 0.9])
    classes = jnp.asarray([0, 2, 1], jnp.int32)
    coefs = jnp.zeros((3, 2))
    # scalar 0.3 drops both 0.25-score boxes
    det = nms_fixed(boxes, scores, classes, coefs, 0.3, 0.45, 4)
    assert np.asarray(det.valid).sum() == 1
    # lowering only class 2's threshold recovers exactly that box
    det2 = nms_fixed(boxes, scores, classes, coefs,
                     (0.3, 0.3, 0.2, 0.3), 0.45, 4)
    v2 = np.asarray(det2.valid)
    assert v2.sum() == 2
    kept = set(np.asarray(det2.classes)[v2].tolist())
    assert kept == {1, 2}
    # an all-equal tuple matches the scalar result exactly
    det3 = nms_fixed(boxes, scores, classes, coefs,
                     (0.3, 0.3, 0.3, 0.3), 0.45, 4)
    for a, b in zip(det, det3):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_process_masks_crop():
    hp = wp = 8
    proto = np.zeros((hp, wp, 2), np.float32)
    proto[:, :, 0] = 4.0  # high logit everywhere on channel 0
    det = Detections(
        boxes=jnp.asarray([[8.0, 8.0, 24.0, 24.0]]),  # in 32x32 input px
        scores=jnp.asarray([0.9]),
        classes=jnp.asarray([1], jnp.int32),
        coefs=jnp.asarray([[1.0, 0.0]]),
        valid=jnp.asarray([True]),
    )
    masks = np.asarray(process_masks(jnp.asarray(proto), det, (32, 32)))
    assert masks.shape == (1, 32, 32)
    assert masks[0, 16, 16]
    assert not masks[0, 2, 2]  # cropped outside the box


def test_flax_path_mapping():
    assert _flax_path("model.2.m.0.cv1.conv.weight") == (
        ("model_2", "m_0", "cv1", "conv"), "weight")
    assert _flax_path("model.23.cv3.0.0.0.conv.weight") == (
        ("model_23", "cv3_0_0_0", "conv"), "weight")
    assert _flax_path("model.23.proto.cv1.bn.running_mean") == (
        ("model_23", "proto_cv1", "bn"), "running_mean")
    assert _flax_path("model.10.m.0.ffn.0.conv.weight") == (
        ("model_10", "m_0", "ffn_0", "conv"), "weight")
    assert _flax_path("model.23.cv2.1.2.bias") == (
        ("model_23", "cv2_1_2"), "bias")


def test_convert_fills_template(seg_model):
    """Synthesize a torch-style state dict from the flax template (inverse
    transposes) and check the converter reconstructs every tensor."""
    model, variables = seg_model
    import jax.tree_util as jtu

    template = jax.device_get(variables)

    def to_mutable(t):
        if hasattr(t, "items"):
            return {k: to_mutable(v) for k, v in t.items()}
        return np.asarray(t)

    template = to_mutable(template)

    state = {}

    def emit(path, tree, kind):
        for k, v in tree.items():
            p = path + [k]
            if isinstance(v, dict):
                emit(p, v, kind)
                continue
            name = ".".join(p)
            # invert the converter's merge rules to a torch-style name
            name = name.replace("_", ".")
            # model.N, m.N, cvA.i.j, proto.* all come out right except
            # tokens like "cv1" -> "cv.1"; undo digit-splitting of cvN
            name = (
                name.replace("cv.1", "cv1").replace("cv.2", "cv2")
                .replace("cv.3", "cv3").replace("cv.4", "cv4")
                .replace("ffn.0.conv", "ffn.0.conv")
            )
            if kind == "params":
                if k == "kernel":
                    if "upsample" in name:
                        t = v.transpose(3, 2, 0, 1)  # flax tk=True -> torch
                    else:
                        t = v.transpose(3, 2, 0, 1)  # flax->torch conv
                    state[name.replace(".kernel", ".weight")] = t
                elif k == "scale":
                    state[name.replace(".scale", ".weight")] = v
                else:
                    state[name] = v
            else:
                if k == "mean":
                    state[name.replace(".mean", ".running_mean")] = v
                elif k == "var":
                    state[name.replace(".var", ".running_var")] = v

    emit([], template["params"], "params")
    emit([], template.get("batch_stats", {}), "stats")

    out = convert_state_to_variables(state, template)
    # every leaf should be identical to the template values we started from
    flat_a = jtu.tree_leaves(out["params"])
    flat_b = jtu.tree_leaves(template["params"])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        assert a.shape == b.shape
        assert np.allclose(a, b)


def test_torch_layout_equivalence():
    """Numeric parity of the conv/BN/deconv layout transposes vs torch."""
    import torch

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 6, 10, 10)).astype(np.float32)

    # conv with groups
    wt = rng.standard_normal((8, 3, 3, 3)).astype(np.float32)  # groups=2
    tconv = torch.nn.Conv2d(6, 8, 3, padding=1, groups=2, bias=False)
    tconv.weight.data = torch.from_numpy(wt)
    ref = tconv(torch.from_numpy(x)).detach().numpy()
    from flax import linen as nn

    fconv = nn.Conv(8, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=2, use_bias=False)
    params = {"params": {"kernel": jnp.asarray(wt.transpose(2, 3, 1, 0))}}
    got = fconv.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert np.allclose(np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-4)

    # conv transpose 2x2 stride 2
    wt = rng.standard_normal((6, 4, 2, 2)).astype(np.float32)
    tdec = torch.nn.ConvTranspose2d(6, 4, 2, 2, bias=True)
    tdec.weight.data = torch.from_numpy(wt)
    bias = rng.standard_normal(4).astype(np.float32)
    tdec.bias.data = torch.from_numpy(bias)
    ref = tdec(torch.from_numpy(x)).detach().numpy()
    fdec = nn.ConvTranspose(4, (2, 2), strides=(2, 2), transpose_kernel=True)
    # torch ConvTranspose2d weight (I, O, kh, kw) -> (kh, kw, O, I)
    params = {"params": {"kernel": jnp.asarray(wt.transpose(2, 3, 1, 0)),
                         "bias": jnp.asarray(bias)}}
    got = fdec.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert np.allclose(np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-4)


def test_letterbox_params():
    scale, px, py = letterbox_params(300, 512, 640)
    assert np.isclose(scale, 640 / 512)
    assert px == 0 and py == (640 - int(round(300 * scale))) // 2


def test_segmenter_end_to_end_random_weights():
    seg = TissueSegmenter(imgsz=IMG, max_det=16, conf=0.0)
    img = (np.random.default_rng(0).uniform(0, 255, (IMG, IMG))).astype(np.uint8)
    labels, t = seg.predict_labels(img)
    assert labels.shape == (IMG, IMG)
    assert labels.min() >= -1 and labels.max() < 4
    assert t >= 0


def test_bf16_inference_agrees_with_f32():
    import jax

    seg32 = TissueSegmenter(imgsz=IMG, max_det=16, conf=0.0, seed=7)
    seg16 = TissueSegmenter(imgsz=IMG, max_det=16, conf=0.0, seed=7,
                            dtype="bfloat16")
    img = (np.random.default_rng(3).uniform(0, 255, (2, IMG, IMG))).astype(
        np.uint8
    )
    # raw head outputs correlate strongly between precisions
    x32, *_ = __import__("eitx.models.yolo.infer", fromlist=["_prep_batch"])._prep_batch(img, IMG)
    out32 = seg32.model.apply(seg32.variables, x32, train=False)
    out16 = seg16.model.apply(
        seg16.variables, x32.astype(jnp.bfloat16), train=False
    )
    a = np.asarray(out32["levels"][0][1], np.float32).ravel()
    b = np.asarray(out16["levels"][0][1].astype(jnp.float32)).ravel()
    cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert cos > 0.98, cos
    # label path runs end to end in bf16
    lab = seg16.segment_labels(img)
    assert lab.shape == (2, IMG, IMG)


class _BlockTorch:
    """Import hook: any attempt to import torch fails inside the block."""

    def find_module(self, name, path=None):
        if name == "torch" or name.startswith("torch."):
            return self

    def load_module(self, name):
        raise ImportError(f"torch blocked for this test: {name}")


def _with_torch_blocked(fn):
    import sys

    saved = {k: v for k, v in sys.modules.items()
             if k == "torch" or k.startswith("torch.")}
    for k in saved:
        del sys.modules[k]
    blocker = _BlockTorch()
    sys.meta_path.insert(0, blocker)
    try:
        return fn()
    finally:
        sys.meta_path.remove(blocker)
        sys.modules.update(saved)


def _make_torch_net(small=False):
    import torch.nn as nn

    mods = ([nn.Conv2d(1, 2, 1)] if small else
            [nn.Conv2d(3, 4, 3, bias=False), nn.BatchNorm2d(4),
             nn.ConvTranspose2d(4, 2, 2, 2)])
    net = nn.Module()
    net.model = nn.Sequential(*mods)
    return net


def test_ptread_roundtrip_module_graph(tmp_path):
    """Write a real torch checkpoint shaped like an ultralytics one
    (fp16 module graph under 'model'), read it back with NO torch."""
    torch = pytest.importorskip("torch")

    from eitx.models.yolo.convert import load_torch_state

    torch.manual_seed(0)
    net = _make_torch_net().half()
    path = str(tmp_path / "ckpt.pt")
    torch.save({"model": net, "epoch": 3, "train_args": {"imgsz": 640}}, path)

    state = _with_torch_blocked(lambda: load_torch_state(path))
    ref = {k: v.float().numpy() for k, v in net.state_dict().items()
           if "num_batches" not in k}
    for k, v in ref.items():
        assert k in state, (k, sorted(state))
        assert state[k].dtype == np.float32
        assert np.allclose(state[k], v), k
    # running stats and counters present / skipped correctly
    assert "model.1.running_mean" in state


def test_ptread_prefers_ema_and_reads_bf16(tmp_path):
    torch = pytest.importorskip("torch")

    from eitx.models.yolo.convert import load_torch_state

    torch.manual_seed(1)
    raw, ema = _make_torch_net(small=True), _make_torch_net(small=True).bfloat16()
    path = str(tmp_path / "ema.pt")
    torch.save({"model": raw, "ema": ema}, path)
    state = _with_torch_blocked(lambda: load_torch_state(path))
    want = ema.state_dict()["model.0.weight"].float().numpy()
    assert np.allclose(state["model.0.weight"], want)


def test_ptread_raw_state_dict(tmp_path):
    torch = pytest.importorskip("torch")

    from eitx.models.yolo.convert import load_torch_state

    sd = {"a.weight": torch.arange(6, dtype=torch.float16).reshape(2, 3),
          "b.bias": torch.ones(4)}
    # non-contiguous tensor exercises the stride path
    sd["c.weight"] = torch.arange(12, dtype=torch.float32).reshape(3, 4).t()
    path = str(tmp_path / "sd.pt")
    torch.save(sd, path)
    state = _with_torch_blocked(lambda: load_torch_state(path))
    assert np.allclose(state["a.weight"], np.arange(6).reshape(2, 3))
    assert np.allclose(state["b.bias"], 1.0)
    assert np.allclose(state["c.weight"],
                       np.arange(12).reshape(3, 4).T)


def test_segment_labels_chunked_matches_single():
    """The streamed/chunked path must produce identical labels to the
    single-dispatch path, including a ragged tail batch."""
    seg = TissueSegmenter(imgsz=IMG, variant="n", max_det=8, seed=3)
    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 255, (11, IMG, IMG), dtype=np.uint8)
    whole = seg.segment_labels(imgs, chunk=64)   # single dispatch
    parts = seg.segment_labels(imgs, chunk=4)    # 2 full chunks + pad tail
    assert whole.shape == (11, IMG, IMG)
    assert np.array_equal(whole, parts)


def test_label_composition_coarse_matches_fullres():
    """REGRESSION: composing the label image at proto resolution must
    agree with full-resolution composition (boxes are in input pixels
    regardless of the requested output size — a wrong crop scale blanks
    every label, which round-2 hit with a trained checkpoint)."""
    from eitx.models.yolo.post import postprocess_segment_labels

    spec = yolov11_spec("n", nc=4, segment=True)
    model = YoloV11(spec)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, IMG, IMG, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x, train=False)
    conf = 0.01  # random weights: take whatever fires
    det, full = postprocess_segment_labels(
        out, (IMG, IMG), conf, 0.45, 8
    )
    _, coarse = postprocess_segment_labels(
        out, (IMG, IMG), conf, 0.45, 8, out_hw=(IMG // 4, IMG // 4)
    )
    assert bool(det.valid.any()), "need detections for this test"
    full = np.asarray(full[0])
    coarse = np.asarray(coarse[0])
    # some foreground must survive (the bug blanked everything)
    assert (full >= 0).any()
    assert (coarse >= 0).any()
    up = coarse.repeat(4, 0).repeat(4, 1)
    agree = (up == full).mean()
    assert agree > 0.98, agree


def test_checkpoint_meta_variant_adopted(tmp_path):
    """A runner given an eitx checkpoint adopts the checkpoint's recorded
    size variant, and refuses a class-count mismatch."""
    import pytest
    from flax import serialization

    from eitx.core.errors import ModelError
    from eitx.models.yolo.infer import TissueSegmenter
    from eitx.models.yolo.model import YoloV11, yolov11_spec

    spec = yolov11_spec("n", nc=4, segment=True)
    model = YoloV11(spec)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    payload = {
        "params": jax.device_get(variables["params"]),
        "batch_stats": jax.device_get(variables.get("batch_stats", {})),
        "meta": {"variant": "n", "imgsz": 64, "nc": 4},
    }
    path = str(tmp_path / "ck.msgpack")
    with open(path, "wb") as fh:
        fh.write(serialization.msgpack_serialize(payload))

    seg = TissueSegmenter(imgsz=64, weights=path, variant="s")  # wrong variant
    assert seg.spec is not None
    lab = seg.segment_labels(np.zeros((1, 64, 64), np.uint8))
    assert lab.shape == (1, 64, 64)

    with pytest.raises(ModelError):
        TissueSegmenter(imgsz=64, weights=path, nc=7)


def test_segment_labels_quality_path():
    """compose_full=True (quality path): full-resolution soft-mask
    upsample before threshold. Must keep the chunked==single invariant,
    produce the same shape, and agree with the throughput path on the
    vast majority of pixels (they differ only at 1/4-cell boundaries)."""
    seg = TissueSegmenter(imgsz=IMG, variant="n", max_det=8, seed=3)
    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 255, (5, IMG, IMG), dtype=np.uint8)
    q_whole = seg.segment_labels(imgs, chunk=64, compose_full=True)
    q_parts = seg.segment_labels(imgs, chunk=2, compose_full=True)
    assert q_whole.shape == (5, IMG, IMG)
    assert np.array_equal(q_whole, q_parts)
    thr = seg.segment_labels(imgs, chunk=64, compose_full=False)
    agree = (q_whole == thr).mean()
    assert agree > 0.9, agree


def test_proto_stride2_shapes_and_meta_adoption(tmp_path):
    """proto_stride=2 doubles the proto grid; a checkpoint recording it is
    rebuilt with the high-res head automatically, and the tolerant warm
    start transfers everything except the new proto stage."""
    from flax import serialization

    from eitx.models.yolo.convert import merge_state_dict
    from eitx.models.yolo.model import YoloV11, yolov11_spec

    spec2 = yolov11_spec("n", nc=4, segment=True, proto_stride=2)
    model2 = YoloV11(spec2)
    v2 = model2.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    out = model2.apply(v2, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out["proto"].shape == (1, 32, 32, 32)  # stride 2, not 4

    # warm start stride-2 graph from a stride-4 checkpoint: backbone/neck/
    # heads copy over, the new proto stage (and reshaped cv3) start fresh
    spec4 = yolov11_spec("n", nc=4, segment=True, proto_stride=4)
    v4 = YoloV11(spec4).init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    merged, copied, skipped, unused = merge_state_dict(
        jax.device_get(v2["params"]), jax.device_get(v4["params"])
    )
    assert copied and skipped
    assert all("proto" in s for s in skipped)
    # and the reverse direction reports the dropped trained tensors
    _, _, _, unused_rev = merge_state_dict(
        jax.device_get(v4["params"]), jax.device_get(v2["params"])
    )
    assert unused_rev and all("proto" in u for u in unused_rev)

    # a checkpoint carrying proto_stride=2 meta drives the right graph
    payload = {
        "params": jax.device_get(v2["params"]),
        "batch_stats": jax.device_get(v2.get("batch_stats", {})),
        "meta": {"variant": "n", "imgsz": 64, "nc": 4, "proto_stride": 2},
    }
    path = str(tmp_path / "hr.msgpack")
    with open(path, "wb") as fh:
        fh.write(serialization.msgpack_serialize(payload))
    seg = TissueSegmenter(imgsz=64, weights=path)
    assert seg.spec.proto_stride == 2
    lab = seg.segment_labels(np.zeros((2, 64, 64), np.uint8))
    assert lab.shape == (2, 64, 64)


@pytest.mark.parametrize("imgsz", [256, 512])
def test_trained_checkpoint_predicts_in_input_frame(imgsz):
    """Every serving tissue checkpoint must segment lung ON the dark (air)
    pixels of its own input, not at their rot180 position.

    Integration regression for the round-3 training-frame bug: phantom
    pairs misaligned by 180 degrees taught the model — via its global
    receptive field — to paint masks at the rotated location, which every
    phantom-based eval scored as correct because the eval GT carried the
    same rotation. Physics can't be fooled: in a 40/400-windowed CT, lung
    is near-black, bone near-white, in the frame of the image the model
    was given."""
    from eitx.core.weights import find_checkpoint
    from eitx.image import window_normalize
    from eitx.train.phantoms import thorax_phantom_hu

    ckpt = find_checkpoint("tissue", imgsz)
    if ckpt is None:
        pytest.skip("no trained checkpoint in weights/")
    hu, _ = thorax_phantom_hu(
        np.random.default_rng(77001), imgsz, rich=True
    )
    img = np.asarray(window_normalize(hu, 40.0, 400.0))
    seg = TissueSegmenter(imgsz=imgsz, weights=ckpt, max_det=16)
    pred = seg.segment_labels(img[None], chunk=1, compose_full=True)[0]
    lung = pred == 2
    assert lung.sum() > 200, "trained model must find the lungs"
    f = img.astype(np.float32)
    assert f[lung].mean() < 30.0, (
        "predicted lung must sit on dark pixels of the model's own input "
        f"(got mean {f[lung].mean():.1f}); if this fails the training "
        "image/label frames have diverged again"
    )


def test_tta_fill_background_only_merge():
    """hflip TTA must be a monotone background-fill: wherever the merged
    labels differ from the straight pass, the straight pass was
    background (-1) — an existing label is never overwritten. On a
    mirror-symmetric input the merge is a no-op."""
    base = TissueSegmenter(imgsz=IMG, variant="n", max_det=8, seed=3,
                           conf=0.0)
    tta = TissueSegmenter(imgsz=IMG, variant="n", max_det=8, seed=3,
                          conf=0.0, tta_fill=True)
    rng = np.random.default_rng(11)
    imgs = rng.integers(0, 255, (3, IMG, IMG), dtype=np.uint8)
    straight = base.segment_labels(imgs, chunk=8)
    merged = tta.segment_labels(imgs, chunk=8)
    diff = merged != straight
    assert np.all(straight[diff] == -1)
    # where the straight pass labeled, the merge preserved it exactly
    assert np.array_equal(merged[straight >= 0], straight[straight >= 0])
    # mirror-symmetric input: flipped pass sees the same image, so the
    # fill can only add what the straight pass already produced
    sym = np.concatenate([imgs[:, :, : IMG // 2],
                          imgs[:, :, : IMG // 2][:, :, ::-1]], axis=2)
    s_straight = base.segment_labels(sym, chunk=8)
    s_merged = tta.segment_labels(sym, chunk=8)
    d = s_merged != s_straight
    assert np.all(s_straight[d] == -1)
    assert np.all(s_merged[d] == s_straight[:, :, ::-1][d])


def test_tta_three_views_monotone():
    """3-view TTA (straight+hflip+vflip) keeps the monotone-fill
    invariant and can only add labels over the 2-view merge."""
    two = TissueSegmenter(imgsz=IMG, variant="n", max_det=8, seed=3,
                          conf=0.0, tta_fill=True)
    three = TissueSegmenter(imgsz=IMG, variant="n", max_det=8, seed=3,
                            conf=0.0, tta_fill=3)
    assert two.tta_views == 2 and three.tta_views == 3
    rng = np.random.default_rng(13)
    imgs = rng.integers(0, 255, (2, IMG, IMG), dtype=np.uint8)
    m2 = two.segment_labels(imgs, chunk=8)
    m3 = three.segment_labels(imgs, chunk=8)
    diff = m3 != m2
    assert np.all(m2[diff] == -1)  # vflip view only fills background


def test_tta_four_views_monotone():
    """4-view TTA (+rot180) only fills background over the 3-view merge."""
    three = TissueSegmenter(imgsz=IMG, variant="n", max_det=8, seed=3,
                            conf=0.0, tta_fill=3)
    four = TissueSegmenter(imgsz=IMG, variant="n", max_det=8, seed=3,
                           conf=0.0, tta_fill=4)
    rng = np.random.default_rng(17)
    imgs = rng.integers(0, 255, (2, IMG, IMG), dtype=np.uint8)
    m3 = three.segment_labels(imgs, chunk=8)
    m4 = four.segment_labels(imgs, chunk=8)
    diff = m4 != m3
    assert np.all(m3[diff] == -1)
