"""Synthetic CT-like training batches.

Generates ellipse phantoms with per-instance boxes and masks in the YOLO
segmentation target format — the in-repo analogue of the reference's
HU-threshold pseudo-labeling dataset builders (scripts/create_femm_dataset
hu_ranges at :757-762), usable for trainer tests and multi-chip dry runs
without patient data.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def synthetic_ct_batch(
    batch: int = 2,
    imgsz: int = 256,
    max_instances: int = 8,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Returns dict(images (B,S,S,3) f32[0,1], boxes (B,I,4) xyxy px,
    classes (B,I) int32, masks (B,I,S/4,S/4) f32, valid (B,I) bool)."""
    rng = np.random.default_rng(seed)
    s = imgsz
    ms = imgsz // 4
    images = np.zeros((batch, s, s, 3), np.float32)
    boxes = np.zeros((batch, max_instances, 4), np.float32)
    classes = np.zeros((batch, max_instances), np.int32)
    masks = np.zeros((batch, max_instances, ms, ms), np.float32)
    valid = np.zeros((batch, max_instances), bool)
    yy, xx = np.mgrid[0:s, 0:s]
    for b in range(batch):
        # body
        img = rng.normal(0.05, 0.02, (s, s)).astype(np.float32)
        cx, cy = s / 2 + rng.uniform(-10, 10), s / 2 + rng.uniform(-10, 10)
        rx, ry = s * 0.4, s * 0.3
        body = ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 < 1
        img[body] = 0.45 + rng.normal(0, 0.02, body.sum())
        n_inst = rng.integers(2, max_instances // 2 + 1)
        for i in range(n_inst):
            cls = int(rng.integers(0, 4))
            icx = cx + rng.uniform(-rx * 0.5, rx * 0.5)
            icy = cy + rng.uniform(-ry * 0.5, ry * 0.5)
            irx = rng.uniform(s * 0.04, s * 0.12)
            iry = rng.uniform(s * 0.04, s * 0.12)
            blob = ((xx - icx) / irx) ** 2 + ((yy - icy) / iry) ** 2 < 1
            shade = {0: 0.95, 1: 0.55, 2: 0.15, 3: 0.35}[cls]
            img[blob] = shade + rng.normal(0, 0.02, blob.sum())
            boxes[b, i] = [icx - irx, icy - iry, icx + irx, icy + iry]
            classes[b, i] = cls
            # instance mask at proto resolution
            mby = blob[::4, ::4]
            masks[b, i] = mby.astype(np.float32)
            valid[b, i] = True
        images[b] = np.repeat(np.clip(img, 0, 1)[..., None], 3, axis=-1)
    return {
        "images": images,
        "boxes": boxes,
        "classes": classes,
        "masks": masks,
        "valid": valid,
    }


def device_batches(
    data: Dict[str, np.ndarray],
    batch: int,
    seed: int = 0,
    augment: bool = True,
    flip_h_prob: float = 0.5,
    flip_v_prob: float = 0.25,
    mosaic_prob: float = 0.0,
    mosaic_budget: int = 0,
):
    """Device-resident minibatch stream.

    Uploads the pregenerated sample store to the accelerator ONCE and
    draws every training batch with an on-device gather + flip
    augmentation, so the per-step host->device traffic is one PRNG key
    instead of the full batch.

    Motivation: on relay-attached chips every h2d transfer costs link
    bandwidth AND the relay client leaks host memory proportional to the
    bytes moved (measured ~1.8x payload per transfer; a 19k-step run at
    8 MB/step leaks >100 GB of host RSS and gets OOM-killed). A
    3k-sample 256^2 store is ~3 GB and fits HBM comfortably; on-device
    gathers move nothing over the link.

    The flip mirror coordinate comes from the store's own image size
    (a cache written at a different imgsz than the run's flag would
    otherwise silently corrupt every flipped box). Resumed runs pass a
    ``seed`` derived from the restored step so a continuation draws a
    fresh batch stream instead of replaying the original run's prefix.

    Yields device-array dicts with the same keys/dtypes as the old host
    batcher: images u8 / masks u8 / boxes f32 / classes i32 / valid
    bool. A ``masks`` key is optional (detection-only stores). Sampling
    is i.i.d. uniform with replacement, vs an epoch shuffle —
    statistically equivalent over the multi-epoch budgets used here.

    ``mosaic_prob`` > 0 replaces that fraction of samples with a
    quadrant mosaic (YOLO-style, fixed center for static shapes): four
    store samples downscaled 2x into the four quadrants of one canvas.
    Each mosaic carries half-scale bodies (cross-scale supervision that
    a fixed-imgsz stream never sees), instances truncated at quadrant
    seams, and 4x the instance density. The target budget for a mosaic
    is ``mosaic_budget`` (0 = same I as the store); candidates beyond
    the budget are dropped by RANDOM selection among valid instances —
    top-area selection would systematically discard exactly the small
    muscle groups the augmentation exists to teach. Dropped instances
    become background supervision for their anchors, so runs using
    mosaics should raise the budget (``--max-instances``-sized targets
    come from the caller's store; pass ``mosaic_budget`` up to 4x that).
    ``mosaic_prob=0`` keeps the PRNG split count and every drawn batch
    bit-identical to the pre-mosaic stream.
    """
    import jax
    import jax.numpy as jnp

    keys = [k for k in ("images", "boxes", "classes", "masks", "valid")
            if k in data]
    store = {k: jax.device_put(np.ascontiguousarray(data[k]))
             for k in keys}
    n = int(store["images"].shape[0])
    size = float(data["images"].shape[1])
    I_store = int(store["boxes"].shape[1])
    I_out = max(int(mosaic_budget) or I_store, I_store)

    def _pad_targets(b):
        """Pad target axes from the store budget to I_out (mosaic runs
        widen the budget; plain samples pad with invalid slots)."""
        if I_out == I_store:
            return b
        pad = I_out - I_store
        out = dict(b)
        out["boxes"] = jnp.pad(b["boxes"], ((0, 0), (0, pad), (0, 0)))
        out["classes"] = jnp.pad(b["classes"], ((0, 0), (0, pad)))
        out["valid"] = jnp.pad(b["valid"], ((0, 0), (0, pad)))
        if "masks" in b:
            out["masks"] = jnp.pad(
                b["masks"], ((0, 0), (0, pad), (0, 0), (0, 0))
            )
        return out

    def _mosaic(store, kidx, ksel):
        """(batch,) quadrant mosaics with random-selection budget."""
        idx4 = jax.random.randint(kidx, (batch, 4), 0, n)
        g = {k: jnp.take(v, idx4.reshape(-1), axis=0) for k, v in
             store.items()}
        # images: (4B, S, S, 3) u8 -> 2x2 mean downscale -> quadrants
        img = g["images"]
        s2 = img.shape[1] // 2
        small = img.reshape(batch * 4, s2, 2, s2, 2, img.shape[-1])
        small = small.astype(jnp.float32).mean((2, 4))
        small = small.reshape(batch, 4, s2, s2, img.shape[-1])
        top = jnp.concatenate([small[:, 0], small[:, 1]], axis=2)
        bot = jnp.concatenate([small[:, 2], small[:, 3]], axis=2)
        canvas = jnp.concatenate([top, bot], axis=1)
        if jnp.issubdtype(img.dtype, jnp.integer):
            canvas = jnp.round(canvas)
        canvas = canvas.astype(img.dtype)
        # boxes: scale 0.5 + per-quadrant offset; invalid slots stay 0
        box = g["boxes"].reshape(batch, 4, I_store, 4) * 0.5
        offs = jnp.asarray(
            [[0.0, 0.0], [s2, 0.0], [0.0, s2], [s2, s2]], box.dtype
        )
        box = box + jnp.tile(offs[None, :, None, :], (1, 1, 1, 2))
        val = g["valid"].reshape(batch, 4, I_store)
        box = box * val[..., None]
        box = box.reshape(batch, 4 * I_store, 4)
        cls = g["classes"].reshape(batch, 4 * I_store)
        val = val.reshape(batch, 4 * I_store)
        # random budget selection among valid candidates
        score = jax.random.uniform(ksel, (batch, 4 * I_store))
        score = jnp.where(val, score + 1.0, score)  # valid first
        _, keep = jax.lax.top_k(score, I_out)
        take = lambda a: jnp.take_along_axis(  # noqa: E731
            a, keep.reshape(keep.shape + (1,) * (a.ndim - 2)), axis=1
        )
        out = {
            "images": canvas,
            "boxes": take(box),
            "classes": jnp.take_along_axis(cls, keep, axis=1),
            "valid": jnp.take_along_axis(val, keep, axis=1),
        }
        if "masks" in g:
            msk = g["masks"]  # (4B, I, r, r)
            r = msk.shape[-1]
            r2 = r // 2
            m = msk.reshape(batch * 4 * I_store, r2, 2, r2, 2)
            m = m.astype(jnp.float32).mean((2, 4))
            m = m.reshape(batch, 4, I_store, r2, r2)
            quad = jnp.zeros(
                (batch, 4, I_store, r, r), jnp.float32
            )
            quad = quad.at[:, 0, :, :r2, :r2].set(m[:, 0])
            quad = quad.at[:, 1, :, :r2, r2:].set(m[:, 1])
            quad = quad.at[:, 2, :, r2:, :r2].set(m[:, 2])
            quad = quad.at[:, 3, :, r2:, r2:].set(m[:, 3])
            quad = quad.reshape(batch, 4 * I_store, r, r)
            if jnp.issubdtype(msk.dtype, jnp.integer):
                quad = jnp.round(quad)
            out["masks"] = take(quad.astype(msk.dtype))
        return out

    @jax.jit
    def draw(store, key):
        if mosaic_prob:
            kidx, kh, kv, km, kmi, ksel = jax.random.split(key, 6)
        else:
            kidx, kh, kv = jax.random.split(key, 3)
        idx = jax.random.randint(kidx, (batch,), 0, n)
        b = {k: jnp.take(v, idx, axis=0) for k, v in store.items()}
        b = _pad_targets(b)
        if mosaic_prob:
            mos = _mosaic(store, kmi, ksel)
            sel = jax.random.uniform(km, (batch,)) < mosaic_prob
            b = {
                k: jnp.where(
                    sel.reshape((batch,) + (1,) * (v.ndim - 1)), mos[k], v
                )
                for k, v in b.items()
            }
        if not augment:
            return b
        img, box = b["images"], b["boxes"]
        val = b["valid"][..., None]
        sel_h = jax.random.uniform(kh, (batch,)) < flip_h_prob
        sel_v = jax.random.uniform(kv, (batch,)) < flip_v_prob
        img = jnp.where(sel_h[:, None, None, None], jnp.flip(img, 2), img)
        box_h = jnp.stack([size - box[..., 2], box[..., 1],
                           size - box[..., 0], box[..., 3]], -1)
        box = jnp.where(sel_h[:, None, None], box_h, box)
        img = jnp.where(sel_v[:, None, None, None], jnp.flip(img, 1), img)
        box_v = jnp.stack([box[..., 0], size - box[..., 3],
                           box[..., 2], size - box[..., 1]], -1)
        box = jnp.where(sel_v[:, None, None], box_v, box)
        box = jnp.where(val, box, 0.0)
        out = {**b, "images": img, "boxes": box}
        if "masks" in b:
            msk = b["masks"]
            msk = jnp.where(sel_h[:, None, None, None],
                            jnp.flip(msk, 3), msk)
            msk = jnp.where(sel_v[:, None, None, None],
                            jnp.flip(msk, 2), msk)
            out["masks"] = msk
        return out

    key = jax.random.PRNGKey(seed)
    while True:
        key, sub = jax.random.split(key)
        yield draw(store, sub)
