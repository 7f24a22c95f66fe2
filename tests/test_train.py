import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eitx.parallel import make_device_mesh, shard_batch, shard_params_fsdp
from eitx.train import TrainConfig, Trainer, synthetic_ct_batch
from eitx.train.losses import ciou, dfl_loss
from eitx.train.trainer import _anchors_for, _assign

IMG = 64


def test_ciou_identity_and_disjoint():
    b = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    assert np.isclose(float(ciou(b, b)[0]), 1.0, atol=1e-5)
    b2 = jnp.asarray([[100.0, 100.0, 110.0, 110.0]])
    assert float(ciou(b, b2)[0]) < 0.0


def test_dfl_loss_minimized_at_target():
    reg_max = 16
    logits = np.full((1, 4, reg_max), 0.0, np.float32)
    logits[:, :, 5] = 8.0
    l_at = float(dfl_loss(jnp.asarray(logits), jnp.full((1, 4), 5.0), reg_max).mean())
    l_off = float(dfl_loss(jnp.asarray(logits), jnp.full((1, 4), 9.0), reg_max).mean())
    assert l_at < l_off


def test_assigner_centers():
    anchors, strides = _anchors_for(IMG)
    boxes = jnp.asarray([[8.0, 8.0, 24.0, 24.0], [40.0, 40.0, 56.0, 56.0]])
    valid = jnp.asarray([1.0, 1.0])
    assigned = np.asarray(_assign(anchors, strides, boxes, valid, 2.5))
    a = np.asarray(anchors)
    inside0 = (a[:, 0] > 8) & (a[:, 0] < 24) & (a[:, 1] > 8) & (a[:, 1] < 24)
    assert (assigned[inside0] == 0).all()
    assert (assigned >= 0).sum() > 0
    # invalid targets never assigned
    assigned2 = np.asarray(
        _assign(anchors, strides, boxes, jnp.asarray([1.0, 0.0]), 2.5)
    )
    assert not (assigned2 == 1).any()


def test_train_step_decreases_loss():
    cfg = TrainConfig(imgsz=IMG, variant="n", total_steps=50, warmup_steps=0,
                      lr=5e-3, max_instances=4)
    tr = Trainer(cfg)
    batch = synthetic_ct_batch(batch=2, imgsz=IMG, max_instances=4, seed=1)
    first = tr.train_step(batch)
    losses = [first["loss"]]
    for _ in range(8):
        losses.append(tr.train_step(batch)["loss"])
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_sharded_training_on_cpu_mesh():
    mesh = make_device_mesh(("data", "model"), shape=(4, 2))
    cfg = TrainConfig(imgsz=IMG, variant="n", total_steps=10, warmup_steps=0,
                      max_instances=4)
    tr = Trainer(cfg, mesh=mesh)
    batch = synthetic_ct_batch(batch=8, imgsz=IMG, max_instances=4)
    m = tr.train_step(batch)
    assert np.isfinite(m["loss"])
    # params stay sharded after the step
    leaves = jax.tree_util.tree_leaves(tr.state.params)
    assert any(
        not s.is_fully_replicated for s in (l.sharding for l in leaves)
    )


def test_shard_helpers():
    mesh = make_device_mesh(("data", "model"), shape=(4, 2))
    x = np.zeros((8, 3, 3), np.float32)
    xs = shard_batch(x, mesh)
    assert xs.sharding.spec == jax.sharding.PartitionSpec("data", None, None)
    params = {"w": np.zeros((64, 512), np.float32), "b": np.zeros((7,), np.float32)}
    ps = shard_params_fsdp(params, mesh)
    assert not ps["w"].sharding.is_fully_replicated
    assert ps["b"].sharding.is_fully_replicated


def test_fit_loop_with_ema_and_checkpoint(tmp_path):
    from eitx.train.trainer import fit

    cfg = TrainConfig(imgsz=IMG, variant="n", total_steps=6, warmup_steps=0,
                      max_instances=4)
    tr = Trainer(cfg)

    def batches():
        i = 0
        while True:
            yield synthetic_ct_batch(batch=2, imgsz=IMG, max_instances=4,
                                     seed=i)
            i += 1

    ckpt = str(tmp_path / "fit.msgpack")
    metrics, ema_params = fit(tr, batches(), steps=4, log_every=0,
                              checkpoint_path=ckpt, checkpoint_every=2)
    assert np.isfinite(metrics["loss"])
    import os

    assert os.path.exists(ckpt)
    # EMA params track but differ from the raw params after updates
    raw = jax.tree_util.tree_leaves(jax.device_get(tr.state.params))
    ema = jax.tree_util.tree_leaves(jax.device_get(ema_params))
    assert any(not np.allclose(a, b) for a, b in zip(raw, ema))


def test_assigner_tal_prefers_high_align():
    """TAL: anchors with accurate predicted boxes + confident class score
    win the assignment; anchors outside every target stay negative."""
    from eitx.train.trainer import _assign_tal

    anchors = jnp.asarray([[10.0, 10.0], [30.0, 30.0], [90.0, 90.0]])
    boxes = jnp.asarray([[0.0, 0.0, 40.0, 40.0], [80.0, 80.0, 100.0, 100.0]])
    classes = jnp.asarray([1, 2], jnp.int32)
    valid = jnp.asarray([1.0, 1.0])
    # anchor 0 predicts target 0's box exactly with high class-1 score;
    # anchor 1 predicts it poorly; anchor 2 sits in target 1
    pred = jnp.asarray([
        [0.0, 0.0, 40.0, 40.0],
        [25.0, 25.0, 32.0, 32.0],
        [80.0, 80.0, 100.0, 100.0],
    ])
    logits = jnp.asarray([
        [-4.0, 4.0, -4.0, -4.0],
        [-4.0, 0.0, -4.0, -4.0],
        [-4.0, -4.0, 4.0, -4.0],
    ])
    assigned, align = _assign_tal(
        anchors, pred, logits, boxes, classes, valid, topk=2,
        alpha=1.0, beta=6.0,
    )
    assigned = np.asarray(assigned)
    assert assigned[0] == 0
    assert assigned[2] == 1
    a = np.asarray(align)
    assert a[0, 0] > a[1, 0]  # exact box + confident score wins
    # invalid targets never assign
    assigned2, _ = _assign_tal(
        anchors, pred, logits, boxes, classes, jnp.asarray([1.0, 0.0]),
        topk=2, alpha=1.0, beta=6.0,
    )
    assert not (np.asarray(assigned2) == 1).any()


def test_sharded_segment_labels_matches_single():
    """DP segmentation over the 8-device CPU mesh equals the single-device
    path, including batch padding to the mesh size."""
    from eitx.models.yolo.infer import TissueSegmenter
    from eitx.parallel import make_device_mesh
    from eitx.parallel.shard import sharded_segment_labels

    seg = TissueSegmenter(imgsz=64, variant="n", max_det=8, seed=2)
    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 255, (6, 64, 64), dtype=np.uint8)  # 6 % 8 != 0
    single = seg.segment_labels(imgs)
    mesh = make_device_mesh(("data",))
    sharded = sharded_segment_labels(seg, imgs, mesh)
    assert sharded.shape == single.shape
    assert np.array_equal(sharded, single)


def test_rich_phantom_distribution():
    """rich=True widens the phantom distribution without breaking the
    label contract, and rich=False stays bit-identical to the original
    stream (committed checkpoint reports must remain reproducible)."""
    from eitx.train.phantoms import phantom_batch, thorax_phantom_hu

    rng = np.random.default_rng(11)
    b = phantom_batch(2, 96, 12, rng, return_labels=True, rich=True)
    assert b["valid"].any()
    assert set(np.unique(b["labels"])) <= {-1, 0, 1, 2, 3}
    h1, _ = thorax_phantom_hu(np.random.default_rng(5), 96)
    h2, _ = thorax_phantom_hu(np.random.default_rng(5), 96, rich=False)
    assert np.array_equal(h1, h2)


def test_anatomy_phantom_distribution():
    """anatomy=True produces DISCRETE instance statistics (many separate
    muscle groups + an articulated bone cage — the patient fixture has
    ~43 muscle / ~22 bone polygons, vs 1 ring muscle in classic
    phantoms), its samples still satisfy the image/label physics, and
    anatomy_frac=0.0 leaves the classic rng streams bit-identical."""
    from scipy import ndimage

    from eitx.train.phantoms import phantom_batch, thorax_phantom_hu
    from eitx.scripts.pseudo_label import pseudo_label_slice

    rng = np.random.default_rng(7)
    mus_ccs, bone_ccs = [], []
    for _ in range(3):
        hu, body = thorax_phantom_hu(rng, 192, anatomy=True)
        lab = pseudo_label_slice(hu, body)
        for cls, acc in ((1, mus_ccs), (0, bone_ccs)):
            l, n = ndimage.label(lab == cls)
            sizes = ndimage.sum(lab == cls, l, np.arange(1, n + 1))
            acc.append(int((sizes >= 16).sum()))
    assert max(mus_ccs) >= 4, f"muscle groups not discrete: {mus_ccs}"
    assert max(bone_ccs) >= 8, f"bone cage not articulated: {bone_ccs}"
    # batch path: anatomy samples fit the raised instance budget and the
    # image/label frames stay aligned (lung dark, bone bright)
    b = phantom_batch(2, 192, 40, np.random.default_rng(3),
                      return_labels=True, anatomy_frac=1.0)
    assert b["valid"].sum(1).max() > 12, \
        "anatomy slice must exceed the classic 12-instance budget"
    img, lab = b["images"][..., 0] * 255.0, b["labels"]
    assert img[lab == 2].mean() < 30.0 and img[lab == 0].mean() > 150.0
    # classic streams unchanged (reports stay reproducible)
    h1, _ = thorax_phantom_hu(np.random.default_rng(5), 96, rich=True)
    h2, _ = thorax_phantom_hu(np.random.default_rng(5), 96, rich=True,
                              anatomy=False)
    assert np.array_equal(h1, h2)


def test_phantom_image_label_alignment():
    """Training images and label maps must live in the SAME frame.

    Regression for the round-3 rot180 bug: phantom_batch cancelled
    window_normalize's internal rot180 on the image while still rotating
    the labels, so every training pair was misaligned by 180 degrees and
    the trained segmenter predicted masks at the rot180 position of the
    anatomy it saw. This pins the frames together with physics, not
    conventions: lung-labeled pixels must be DARK in the windowed image
    (air HU clips to 0 in the 40/400 window) and bone-labeled pixels
    BRIGHT — in the image as stored, not its rotation."""
    from eitx.train.phantoms import phantom_batch

    b = phantom_batch(4, 128, 12, np.random.default_rng(31), rich=True,
                      return_labels=True)
    img = b["images"][..., 0] * (
        255.0 if b["images"].dtype != np.uint8 else 1.0
    )
    lab = b["labels"]
    lung, bone = lab == 2, lab == 0
    assert lung.sum() > 100 and bone.sum() > 100
    assert img[lung].mean() < 30.0, "lung pixels must be dark in-frame"
    assert img[bone].mean() > 150.0, "bone pixels must be bright in-frame"
    # and the misaligned frame must NOT satisfy the same physics
    rot = img[:, ::-1, ::-1]
    assert rot[lung].mean() > img[lung].mean() + 20.0


def test_wide_pose_distribution():
    """wide_pose=True widens the POSE family (rotation to +-0.45 rad,
    bodies down to 0.65x the native minimum) while keeping the label
    physics, and wide_pose=False stays bit-identical to every committed
    stream (reports must remain reproducible)."""
    from eitx.train.phantoms import phantom_batch, thorax_phantom_hu

    # flag off: streams unchanged for every layout
    for kw in ({}, {"rich": True}, {"anatomy": True}):
        h1, _ = thorax_phantom_hu(np.random.default_rng(5), 96, **kw)
        h2, _ = thorax_phantom_hu(np.random.default_rng(5), 96,
                                  wide_pose=False, **kw)
        assert np.array_equal(h1, h2), f"stream drifted for {kw}"
    # flag on: body-size range extends below the native anatomy floor
    # (the zoomed-out serving pose that first lost the thin fat rim)
    fracs = []
    rng = np.random.default_rng(13)
    for _ in range(24):
        _, body = thorax_phantom_hu(rng, 128, anatomy=True, wide_pose=True)
        fracs.append((np.asarray(body) > 0).mean())
    native_min = np.pi * 0.34 * 0.26  # anatomy rx*ry floor, ellipse area
    assert min(fracs) < native_min * 0.75, \
        f"wide_pose never sampled a zoomed-out body: min frac {min(fracs)}"
    # batch path: labels still satisfy the image physics under wide poses
    b = phantom_batch(2, 192, 40, np.random.default_rng(3),
                      return_labels=True, anatomy_frac=1.0, wide_pose=True)
    img, lab = b["images"][..., 0] * 255.0, b["labels"]
    assert img[lab == 2].mean() < 30.0 and img[lab == 0].mean() > 150.0


def test_partial_volume_augmentation():
    """pv_sigma_max blurs the IMAGE only — targets stay crisp.

    The labels/boxes/masks of a pv-augmented batch must be identical to
    the unblurred batch of the same seed (the sigma draw happens after
    the per-sample target computation), while the images differ most at
    tissue boundaries. pv_sigma_max=0 must be bit-identical to omitting
    the parameter (committed checkpoint reports depend on the streams)."""
    from eitx.train.phantoms import phantom_batch

    base = phantom_batch(3, 128, 12, np.random.default_rng(77), rich=True,
                         return_labels=True)
    off = phantom_batch(3, 128, 12, np.random.default_rng(77), rich=True,
                        return_labels=True, pv_sigma_max=0.0)
    for k in base:
        assert np.array_equal(base[k], off[k]), k
    pv = phantom_batch(3, 128, 12, np.random.default_rng(77), rich=True,
                       return_labels=True, pv_sigma_max=2.0)
    for k in ("labels", "boxes", "classes", "masks", "valid"):
        assert np.array_equal(base[k], pv[k]), f"{k} must stay crisp"
    scale = 1.0 if base["images"].dtype == np.uint8 else 255.0
    di = scale * np.abs(base["images"].astype(np.float32)
                        - pv["images"].astype(np.float32))[..., 0]
    assert di.max() > 10.0, "blur must actually change the image"
    # boundary pixels (label changes across a neighbor) move more than
    # the interior: partial volume is a boundary effect
    lab = base["labels"]
    edge = np.zeros_like(lab, bool)
    edge[:, 1:, :] |= lab[:, 1:, :] != lab[:, :-1, :]
    edge[:, :, 1:] |= lab[:, :, 1:] != lab[:, :, :-1]
    assert di[edge].mean() > 4.0 * di[~edge].mean()


def test_ood_fixture_pv_variant():
    """The pv render shares the crisp render's noise field and body; the
    HU difference concentrates at polygon boundaries."""
    from eitx.scripts.eval_ood_fixture import render_fixture_hu

    hu, body = render_fixture_hu(128, seed=5)
    hu_pv, body_pv = render_fixture_hu(128, seed=5, pv_sigma=1.5)
    assert np.array_equal(body, body_pv)
    d = np.abs(hu - hu_pv)
    assert d.max() > 50.0  # air->fat boundary smears by hundreds of HU
    # far from any boundary the painted map is constant, so the blur is
    # a no-op there and the (shared) noise field cancels exactly — e.g.
    # the air corner outside the body
    assert d[:8, :8].max() < 1e-3
    # the fixture is detailed at 128px, but a solid fraction of pixels
    # still sits outside every blur footprint
    assert (d < 1e-3).mean() > 0.2


def test_hard_rib_phantom_distribution():
    """hard=True widens the rib phantom distribution (variable count/
    contrast, dropped ribs) and n_pairs=0 yields a clean negative;
    hard=False stays bit-identical for committed-report reproducibility."""
    from eitx.train.phantoms import frontal_rib_phantom

    img, gt = frontal_rib_phantom(np.random.default_rng(3), 320, hard=True)
    assert img.shape == (320, 320) and img.dtype == np.uint8
    assert gt.ndim == 2 and gt.shape[1] == 4
    neg_img, neg_gt = frontal_rib_phantom(
        np.random.default_rng(4), 320, n_pairs=0, hard=True
    )
    assert neg_gt.shape == (0, 4)
    a1, b1 = frontal_rib_phantom(np.random.default_rng(9), 320)
    a2, b2 = frontal_rib_phantom(np.random.default_rng(9), 320, hard=False)
    assert np.array_equal(a1, a2) and np.array_equal(b1, b2)
    # rib counts actually vary across hard draws
    rng = np.random.default_rng(10)
    counts = {frontal_rib_phantom(rng, 320, hard=True)[1].shape[0]
              for _ in range(6)}
    assert len(counts) >= 3


def test_device_batches_shapes_dtypes_and_flip_coherence():
    """Device-resident batcher must match the host batcher's contract
    (keys/dtypes/shapes) and keep image/box/mask flips coherent."""
    from eitx.train.data import device_batches

    n, imgsz, bs = 4, 32, 3
    data = {
        "images": np.zeros((n, imgsz, imgsz, 3), np.uint8),
        "boxes": np.zeros((n, 2, 4), np.float32),
        "classes": np.zeros((n, 2), np.int32),
        "masks": np.zeros((n, 2, imgsz // 2, imgsz // 2), np.uint8),
        "valid": np.zeros((n, 2), bool),
    }
    for i in range(n):
        data["images"][i] = i  # flip-invariant sample tag
        data["masks"][i] = i
        data["boxes"][i, 0] = [i + 1.0, i + 2.0, i + 10.0, i + 20.0]
        data["valid"][i, 0] = True

    # augment off: every sample must be an exact original (gather only)
    b = next(device_batches(data, bs, seed=1, augment=False))
    assert set(b) == set(data)
    for k in data:
        assert b[k].dtype == data[k].dtype, k
        assert b[k].shape == (bs,) + data[k].shape[1:], k
    for s in range(bs):
        i = int(np.asarray(b["images"][s, 0, 0, 0]))
        for k in data:  # every field of slot s comes from sample i
            np.testing.assert_array_equal(np.asarray(b[k][s]), data[k][i])

    # forced horizontal flip: boxes mirror, tags still identify samples,
    # invalid slots stay zeroed
    b = next(device_batches(data, bs, seed=2, augment=True,
                            flip_h_prob=1.0, flip_v_prob=0.0))
    for s in range(bs):
        i = int(np.asarray(b["images"][s, 0, 0, 0]))
        assert int(np.asarray(b["masks"][s, 0, 0, 0])) == i
        exp = [imgsz - (i + 10.0), i + 2.0, imgsz - (i + 1.0), i + 20.0]
        np.testing.assert_allclose(np.asarray(b["boxes"][s, 0]), exp)
        np.testing.assert_array_equal(np.asarray(b["boxes"][s, 1]), 0.0)

    # detection-only store (no masks key) must also work
    det = {k: v for k, v in data.items() if k != "masks"}
    b = next(device_batches(det, bs, seed=3))
    assert "masks" not in b and b["images"].shape[0] == bs


def test_device_batches_mosaic_composition_and_budget():
    """Quadrant mosaic: with a single-sample store the composition is
    fully deterministic — canvas quadrants are the 2x2-mean downscale of
    the sample, boxes land scaled+offset per quadrant, masks move to the
    matching mask-canvas quadrant, and the widened budget pads with
    invalid slots. mosaic_prob=0 must stay bit-identical to the
    pre-mosaic stream (same PRNG split count)."""
    from eitx.train.data import device_batches

    imgsz, bs, I = 32, 2, 3
    rng = np.random.default_rng(7)
    data = {
        "images": rng.integers(0, 255, (1, imgsz, imgsz, 3)).astype(
            np.uint8
        ),
        "boxes": np.zeros((1, I, 4), np.float32),
        "classes": np.asarray([[2, 1, 0]], np.int32),
        "masks": np.zeros((1, I, imgsz // 2, imgsz // 2), np.uint8),
        "valid": np.asarray([[True, True, False]], bool),
    }
    data["boxes"][0, 0] = [4.0, 6.0, 20.0, 28.0]
    data["boxes"][0, 1] = [10.0, 2.0, 30.0, 12.0]
    data["masks"][0, 0, 3:11, 2:10] = 255
    data["masks"][0, 1, 1:6, 5:15] = 128

    budget = 4 * I
    b = next(device_batches(data, bs, seed=5, augment=False,
                            mosaic_prob=1.0, mosaic_budget=budget))
    assert b["images"].shape == (bs, imgsz, imgsz, 3)
    assert b["boxes"].shape == (bs, budget, 4)
    img = np.asarray(b["images"][0])
    small = data["images"][0].reshape(
        imgsz // 2, 2, imgsz // 2, 2, 3
    ).astype(np.float32).mean((1, 3))
    small = np.round(small).astype(np.uint8)
    h = imgsz // 2
    for (r0, c0) in ((0, 0), (0, h), (h, 0), (h, h)):
        np.testing.assert_array_equal(img[r0:r0 + h, c0:c0 + h], small)
    # 8 valid candidates (2 per quadrant copy), budget 12 -> all kept
    val = np.asarray(b["valid"][0])
    assert val.sum() == 8
    boxes = np.asarray(b["boxes"][0])[val]
    expect = set()
    for ox, oy in ((0, 0), (h, 0), (0, h), (h, h)):
        for i in (0, 1):
            x1, y1, x2, y2 = data["boxes"][0, i] * 0.5
            expect.add((x1 + ox, y1 + oy, x2 + ox, y2 + oy))
    got = {tuple(np.round(bx, 3)) for bx in boxes}
    assert got == expect
    # masks follow their quadrant: each kept mask is nonzero only inside
    # one mask-canvas quadrant and its 2x2-mean matches the source
    masks = np.asarray(b["masks"][0])[val]
    r = imgsz // 2
    r2 = r // 2
    for m in masks:
        quads = [m[:r2, :r2], m[:r2, r2:], m[r2:, :r2], m[r2:, r2:]]
        nz = [q.any() for q in quads]
        assert sum(nz) == 1
    # mosaic_prob=0 stays bit-identical to the pre-mosaic stream
    a = next(device_batches(data, bs, seed=9, augment=True))
    c = next(device_batches(data, bs, seed=9, augment=True,
                            mosaic_prob=0.0))
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(c[k]))


def test_resume_schedule_extends_past_restored_count(tmp_path):
    """A resumed run must keep a live LR: restoring an optimizer count of
    N into a schedule with total_steps <= N pins the cosine tail at ~0
    and silently turns the whole continuation into a no-op (the bug that
    burned the first s-256 continuation)."""
    import optax

    from eitx.train.checkpoint import load_checkpoint, peek_step, save_checkpoint

    cfg = TrainConfig(imgsz=IMG, variant="n", total_steps=20, warmup_steps=0,
                      lr=1e-3, max_instances=4)
    tr = Trainer(cfg)
    batch = synthetic_ct_batch(batch=2, imgsz=IMG, max_instances=4, seed=1)
    for _ in range(3):
        tr.train_step(batch)
    path = str(tmp_path / "ck.msgpack.train")
    save_checkpoint(path, tr.state)
    start = peek_step(path)
    assert start == 3

    # the train_tissue --resume recipe: extend total_steps by the restored count
    more = 10
    cfg2 = TrainConfig(imgsz=IMG, variant="n", total_steps=start + more,
                       warmup_steps=0, lr=1e-3, max_instances=4)
    tr2 = Trainer(cfg2)
    tr2.state = load_checkpoint(path, tr2.state)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, cfg2.lr, cfg2.warmup_steps, cfg2.total_steps)
    assert float(sched(tr2.state.step)) > 0.1 * cfg2.lr
    # and the continued steps actually move the params
    p0 = jax.device_get(tr2.state.params)
    tr2.train_step(batch)
    moved = jax.tree_util.tree_reduce(
        lambda a, b: a or b,
        jax.tree_util.tree_map(
            lambda a, b: bool(np.any(a != b)), p0,
            jax.device_get(tr2.state.params)),
    )
    assert moved

def test_mask_class_weights():
    """Per-class mask-loss weighting (TrainConfig.mask_class_w): uniform
    1.0 weights are bit-identical to None, a uniform scale multiplies the
    mask term linearly, and a single-class upweight lands strictly
    between (so the weight really indexes by target class)."""
    batch = synthetic_ct_batch(batch=2, imgsz=IMG, max_instances=4, seed=3)
    present = np.unique(np.asarray(batch["classes"])[np.asarray(batch["valid"])])
    c = int(present[0])
    # the center-radius assigner has positives at random init (TAL's
    # align score is ~0 until the boxes train, zeroing the mask term)
    kw = dict(imgsz=IMG, variant="n", total_steps=10, warmup_steps=0,
              lr=5e-3, max_instances=4, assigner="center")

    tr = Trainer(TrainConfig(**kw))
    base = float(tr.eval_loss(batch)["mask"])
    assert base > 0.0

    def masked(mask_class_w):
        t2 = Trainer(TrainConfig(mask_class_w=mask_class_w, **kw))
        t2.state = tr.state  # identical params: isolate the loss change
        return float(t2.eval_loss(batch)["mask"])

    assert masked((1.0, 1.0, 1.0, 1.0)) == pytest.approx(base, rel=1e-6)
    assert masked((4.0,) * 4) == pytest.approx(4.0 * base, rel=1e-4)
    w = [1.0] * 4
    w[c] = 4.0
    assert base < masked(tuple(w)) < 4.0 * base


def test_geometry_training_stream():
    """Real-geometry stream (geometry_frac): samples render the
    reference's harvested trial geometries (2-5 ONLY — 1 and 6 are
    eval-reserved and refused), carry the real-anatomy instance
    statistics (~26-31 components at 256), satisfy the frame physics
    (lung dark / bone bright in the stored frame), and geometry_frac=0
    leaves the classic streams bit-identical."""
    import pytest

    from eitx.train.phantoms import (
        _train_geometry_polygons,
        geometry_slice_hu,
        phantom_batch,
    )

    b = phantom_batch(3, 256, 48, np.random.default_rng(7),
                      return_labels=True, geometry_frac=1.0)
    assert b["valid"].sum(1).min() >= 20, \
        "real geometries must exceed the classic instance budget"
    img, lab = b["images"][..., 0], b["labels"]
    img = img * (255.0 if b["images"].dtype != np.uint8 else 1.0)
    for cid in range(4):
        assert (lab == cid).sum() > 100, f"class {cid} missing"
    assert img[lab == 2].mean() < 30.0, "lung must be dark in-frame"
    assert img[lab == 0].mean() > 150.0, "bone must be bright in-frame"
    # pose family: two draws from one rng differ (posed, not static)
    rng = np.random.default_rng(11)
    h1, _ = geometry_slice_hu(rng, 128)
    h2, _ = geometry_slice_hu(rng, 128)
    assert not np.array_equal(h1, h2)
    # eval-reserved geometries are refused
    for gid in (1, 6):
        with pytest.raises(ValueError):
            _train_geometry_polygons(gid)
    # flag off => classic stream bit-identical (reports reproducible)
    a = phantom_batch(2, 96, 12, np.random.default_rng(5), rich=True)
    c = phantom_batch(2, 96, 12, np.random.default_rng(5), rich=True,
                      geometry_frac=0.0)
    assert all(np.array_equal(a[k], c[k]) for k in a)


def test_harvested_geometry_renders_plausible():
    """Every harvested trial geometry renders with plausible thoracic
    composition — all four tissues present and the lung at 30-60% of the
    body. Regression for the round-5 harvest bug where trial3 missed the
    femm class remap and its 85k-px body painted as LUNG (muscles/fat
    invisible), poisoning both the eval GT and the training stream."""
    from eitx.geometry import rasterize_polygons
    from eitx.scripts.eval_ood_fixture import (
        GEOMETRIES,
        load_fixture_polygons,
    )

    for g in GEOMETRIES:
        polys = load_fixture_polygons(geometry=g)
        ordered = [(cid, xy) for z in (4, 3, 1, 2, 0)
                   for cid, xy in polys if cid == z]
        lab = rasterize_polygons(ordered, (512, 512), background=-1)
        body = int((lab >= 0).sum())
        px = {c: int((lab == c).sum()) for c in range(4)}
        assert body > 50000, f"trial{g}: body too small ({body})"
        for c in range(4):
            assert px[c] > 0.01 * body, (
                f"trial{g}: class {c} is {px[c]}/{body} px — "
                "class-mapping or rasterization regression"
            )
        assert 0.25 < px[2] / body < 0.60, (
            f"trial{g}: lung fraction {px[2] / body:.2f} implausible"
        )
