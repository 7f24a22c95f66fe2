"""In-framework trainer for the YOLOv11 segmenter.

The reference trains its models outside the repo through the ultralytics
CLI; here training is a first-class, shardable JAX program: a center-based
anchor assigner, CIoU + DFL box losses, BCE classification, and per-
instance mask BCE against sigmoid(coef @ proto), optimized with AdamW.

Parallelism: the batch shards over the mesh ``data`` axis and parameters
shard FSDP-style over ``model`` (see eitx.parallel). XLA inserts the
all-gathers/reduce-scatters; the train step itself is a single pjit'd
program. Pipeline/sequence/expert parallelism do not apply to this
workload (conv net over independent slices) — stated per SURVEY section 5
rather than invented.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.yolo.model import YoloV11, yolov11_spec
from ..models.yolo.post import _dfl
from .losses import ciou, dfl_loss, optax_sigmoid_bce


@dataclass(frozen=True)
class TrainConfig:
    imgsz: int = 256
    nc: int = 4
    variant: str = "s"
    lr: float = 1e-3
    weight_decay: float = 5e-4
    warmup_steps: int = 100
    total_steps: int = 1000
    max_instances: int = 8
    box_w: float = 7.5
    cls_w: float = 0.5
    dfl_w: float = 1.5
    mask_w: float = 2.5
    center_radius: float = 2.5  # cells
    reg_max: int = 16
    # 'tal' = task-aligned assignment (ultralytics' assigner: align =
    # cls_score^alpha * IoU^beta, top-k per target); 'center' = the simpler
    # center-radius fallback.
    assigner: str = "tal"
    segment: bool = True  # False trains a detect-only head (rib model)
    tal_topk: int = 10
    tal_alpha: float = 1.0
    tal_beta: float = 6.0
    # mask loss over only the top-K positive anchors (static gather).
    # 0 = legacy all-anchor path. K >= tal_topk * max_instances loses
    # nothing (there can't be more positives), and the gather makes
    # higher-than-proto-res mask supervision affordable: the target
    # resolution is taken from batch["masks"] and the proto is bilinearly
    # upsampled to it inside the loss when they differ.
    mask_topk: int = 0
    # proto mask-grid stride (see YoloSpec.proto_stride): 2 trains the
    # high-resolution proto head
    proto_stride: int = 4
    # per-class mask-loss weights (len-nc tuple): each positive anchor's
    # mask BCE is scaled by the weight of its target's class. The lever
    # for lagging classes (bone/fat trail lung/muscles by 15+ IoU points).
    # Keep the weights averaging ~1 so the balance vs mask_w is preserved;
    # None = uniform (bit-identical to the unweighted loss).
    mask_class_w: Optional[tuple] = None


@dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: int = 0


def _anchors_for(imgsz: int, strides=(8, 16, 32)):
    pts, strd = [], []
    for s in strides:
        n = imgsz // s
        xs = (np.arange(n) + 0.5) * s
        gx, gy = np.meshgrid(xs, xs)
        pts.append(np.stack([gx.ravel(), gy.ravel()], 1))
        strd.append(np.full((n * n,), s, np.float32))
    return (
        jnp.asarray(np.concatenate(pts), jnp.float32),
        jnp.asarray(np.concatenate(strd), jnp.float32),
    )


def _assign(anchors, strides, boxes, valid, center_radius):
    """Center-based assignment: anchor positive for the smallest target box
    containing it whose center is within center_radius cells.

    anchors (A, 2), boxes (I, 4), valid (I,) ->
    (assigned (A,) int32 target index or -1)."""
    ax, ay = anchors[:, 0][:, None], anchors[:, 1][:, None]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    inside = (ax >= x1) & (ax <= x2) & (ay >= y1) & (ay <= y2)  # (A, I)
    bcx, bcy = (x1 + x2) / 2, (y1 + y2) / 2
    r = center_radius * strides[:, None]
    near = (jnp.abs(ax - bcx) <= r) & (jnp.abs(ay - bcy) <= r)
    ok = inside & near & (valid[None, :] > 0)
    area = jnp.clip((x2 - x1) * (y2 - y1), 1e-6)
    cost = jnp.where(ok, area[None, :], jnp.inf)
    best = jnp.argmin(cost, axis=1)
    has = jnp.isfinite(cost.min(axis=1))
    return jnp.where(has, best, -1)


def _assign_tal(
    anchors, pred_boxes, cls_logits, boxes, classes, valid,
    topk: int, alpha: float, beta: float,
):
    """Task-aligned assignment (the ultralytics TAL assigner).

    align(a, i) = score_a[class_i]^alpha * IoU(pred_a, gt_i)^beta for
    anchors whose center lies inside gt_i; each target keeps its top-k
    anchors by align; an anchor claimed by several targets goes to the one
    with the highest align. Returns ((A,) int32 target index or -1,
    (A, I) align matrix for soft cls targets).
    """
    ax, ay = anchors[:, 0][:, None], anchors[:, 1][:, None]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    inside = (ax >= x1) & (ax <= x2) & (ay >= y1) & (ay <= y2)  # (A, I)
    ok = inside & (valid[None, :] > 0)
    iou_ai = _pairwise_iou(pred_boxes, boxes)  # (A, I)
    score = jax.nn.sigmoid(cls_logits)  # (A, nc)
    score_ai = jnp.take_along_axis(
        score, jnp.broadcast_to(classes[None, :], ok.shape), axis=1
    )  # (A, I)
    align = jnp.where(
        ok, (score_ai ** alpha) * (jnp.clip(iou_ai, 0.0) ** beta), 0.0
    )
    # per-target top-k candidate threshold
    k = min(topk, align.shape[0])
    kth = jnp.sort(align, axis=0)[-k, :]  # (I,)
    cand = ok & (align >= jnp.maximum(kth[None, :], 1e-12)) & (align > 0)
    align_c = jnp.where(cand, align, -1.0)
    best = jnp.argmax(align_c, axis=1)  # (A,)
    has = align_c.max(axis=1) > 0
    return jnp.where(has, best, -1), align


def _pairwise_iou(a, b):
    """(A, 4) x (I, 4) xyxy -> (A, I) IoU."""
    ax1, ay1, ax2, ay2 = a[:, 0:1], a[:, 1:2], a[:, 2:3], a[:, 3:4]
    bx1, by1, bx2, by2 = b[None, :, 0], b[None, :, 1], b[None, :, 2], b[None, :, 3]
    iw = jnp.clip(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0.0)
    ih = jnp.clip(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0.0)
    inter = iw * ih
    area_a = jnp.clip(ax2 - ax1, 0.0) * jnp.clip(ay2 - ay1, 0.0)
    area_b = jnp.clip(bx2 - bx1, 0.0) * jnp.clip(by2 - by1, 0.0)
    return inter / jnp.clip(area_a + area_b - inter, 1e-9)


class Trainer:
    def __init__(
        self,
        cfg: TrainConfig = TrainConfig(),
        mesh: Optional[Mesh] = None,
        seed: int = 0,
    ):
        self.cfg = cfg
        self.mesh = mesh
        spec = yolov11_spec(cfg.variant, nc=cfg.nc, segment=cfg.segment,
                            proto_stride=cfg.proto_stride)
        self.model = YoloV11(spec)
        variables = self.model.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, cfg.imgsz, cfg.imgsz, 3), jnp.float32),
            train=False,
        )
        self.tx = optax.chain(
            optax.clip_by_global_norm(10.0),
            optax.adamw(
                optax.warmup_cosine_decay_schedule(
                    0.0, cfg.lr, cfg.warmup_steps, cfg.total_steps
                ),
                weight_decay=cfg.weight_decay,
            ),
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if mesh is not None:
            from ..parallel.shard import shard_params_fsdp

            params = shard_params_fsdp(params, mesh)
            batch_stats = jax.device_put(
                batch_stats, NamedSharding(mesh, P())
            )
        self.state = TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
        )
        self.anchors, self.strides = _anchors_for(cfg.imgsz)
        self._step_fn = self._build_step()
        self._eval_fn = None

    # ------------------------------------------------------------------
    def _loss_fn(self, params, batch_stats, batch):
        cfg = self.cfg
        images = batch["images"]
        if images.dtype == jnp.uint8:
            # uint8 batches cross the host->device link at 1/4 the bytes;
            # normalization belongs inside the compiled step
            images = images.astype(jnp.float32) / 255.0
        batch = dict(batch)
        if batch["masks"].dtype == jnp.uint8:
            # soft mask targets quantized to uint8 for the same reason
            batch["masks"] = batch["masks"].astype(jnp.float32) / 255.0
        out, mutated = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
        )
        B = images.shape[0]
        reg_max = cfg.reg_max
        box_logits = jnp.concatenate(
            [bm.reshape(B, -1, 4 * reg_max) for bm, _ in out["levels"]], 1
        )
        cls_logits = jnp.concatenate(
            [cm.reshape(B, -1, cfg.nc) for _, cm in out["levels"]], 1
        )
        if cfg.segment:
            coefs = jnp.concatenate(
                [m.reshape(B, -1, m.shape[-1]) for m in out["mask_coefs"]], 1
            )
            proto = out["proto"]  # (B, Hp, Wp, nm)
        else:  # detect-only: zero-width stand-ins keep one code path
            A = box_logits.shape[1]
            coefs = jnp.zeros((B, A, 1), box_logits.dtype)
            proto = jnp.zeros(
                (B, cfg.imgsz // 4, cfg.imgsz // 4, 1), box_logits.dtype
            )
        anchors, strides = self.anchors, self.strides

        def per_image(bl, cl, co, pr, boxes, classes, masks, valid):
            # decode predicted boxes first (TAL scores them)
            d = _dfl(bl, reg_max) * strides[:, None]  # (A, 4) px
            pb = jnp.stack(
                [
                    anchors[:, 0] - d[:, 0],
                    anchors[:, 1] - d[:, 1],
                    anchors[:, 0] + d[:, 2],
                    anchors[:, 1] + d[:, 3],
                ],
                -1,
            )
            if cfg.assigner == "tal":
                assigned, align = _assign_tal(
                    anchors, jax.lax.stop_gradient(pb),
                    jax.lax.stop_gradient(cl), boxes, classes, valid,
                    cfg.tal_topk, cfg.tal_alpha, cfg.tal_beta,
                )
            else:
                assigned = _assign(anchors, strides, boxes, valid,
                                   cfg.center_radius)
                align = None
            pos = assigned >= 0
            tgt = jnp.maximum(assigned, 0)
            tboxes = boxes[tgt]  # (A, 4)
            tcls = classes[tgt]
            n_pos = jnp.maximum(pos.sum(), 1)

            if align is None:
                soft = pos.astype(cl.dtype)  # hard 1.0 targets
            else:
                # ultralytics normalization: per-target align scaled so its
                # best anchor's target equals the target's best IoU
                iou_ai = _pairwise_iou(jax.lax.stop_gradient(pb), boxes)
                max_align = align.max(axis=0)  # (I,)
                max_iou = jnp.clip(iou_ai, 0.0).max(axis=0)  # (I,)
                norm = align * (
                    max_iou / jnp.clip(max_align, 1e-9)
                )[None, :]  # (A, I)
                soft = jnp.take_along_axis(
                    norm, tgt[:, None], axis=1
                )[:, 0] * pos

            # classification BCE over all anchors (soft targets under TAL)
            onehot = jax.nn.one_hot(tcls, cfg.nc) * soft[:, None]
            l_cls = optax_sigmoid_bce(cl, onehot).sum() / jnp.maximum(
                soft.sum(), 1.0
            )

            # box: CIoU on positives, weighted by the soft target score
            w_box = jnp.where(pos, jnp.maximum(soft, 1e-3), 0.0)
            l_box = ((1.0 - ciou(pb, tboxes)) * w_box).sum() / jnp.maximum(
                w_box.sum(), 1e-3
            )

            # dfl against target distances in stride units
            tdist = jnp.stack(
                [
                    anchors[:, 0] - tboxes[:, 0],
                    anchors[:, 1] - tboxes[:, 1],
                    tboxes[:, 2] - anchors[:, 0],
                    tboxes[:, 3] - anchors[:, 1],
                ],
                -1,
            ) / strides[:, None]
            l_dfl = (
                dfl_loss(bl.reshape(-1, 4, reg_max).reshape(
                    bl.shape[0], 4, reg_max), tdist, reg_max) * pos
            ).sum() / n_pos

            # masks: per-anchor supervision (ultralytics v8SegmentationLoss
            # semantics): EVERY positive anchor's own coefficients must
            # reproduce its target's mask, BCE cropped to the target box and
            # normalized by box area. Inference composes a mask from one kept
            # anchor's coefs, so supervising a mean coef per instance trains
            # a quantity never used at test time (and without the box crop,
            # the all-background prior keeps mask logits below threshold).
            if cfg.segment:
                T = masks.shape[1]  # mask supervision resolution
                prm = pr
                if T != pr.shape[0]:
                    # bilinear commutes with the linear coef combination,
                    # so upsampling the proto once == upsampling every
                    # composed mask (the inference quality path's
                    # compose_full semantics)
                    prm = jax.image.resize(
                        pr, (T, T, pr.shape[-1]), method="bilinear"
                    )
                if cfg.mask_topk > 0:
                    K = min(cfg.mask_topk, co.shape[0])
                    # keep the K best positives (soft = TAL quality; all
                    # positives survive whenever K >= #positives)
                    _, sel = jax.lax.top_k(jnp.where(pos, soft, -1.0), K)
                    co_s, tgt_s = co[sel], tgt[sel]
                    pos_s, tb_s = pos[sel], tboxes[sel]
                else:
                    co_s, tgt_s, pos_s, tb_s = co, tgt, pos, tboxes
                pm = jnp.einsum("an,hwn->ahw", co_s, prm)  # (K, T, T)
                tm = masks[tgt_s]  # (K, T, T)
                ds = cfg.imgsz / T  # mask-grid downsample factor
                bxp = tb_s / ds  # boxes in mask-grid coords
                xs_g = jnp.arange(T, dtype=pm.dtype)[None, None, :] + 0.5
                ys_g = jnp.arange(T, dtype=pm.dtype)[None, :, None] + 0.5
                inside = (
                    (xs_g >= bxp[:, 0][:, None, None])
                    & (xs_g < bxp[:, 2][:, None, None])
                    & (ys_g >= bxp[:, 1][:, None, None])
                    & (ys_g < bxp[:, 3][:, None, None])
                )
                bce = optax_sigmoid_bce(pm, tm) * inside
                barea = jnp.clip(
                    (bxp[:, 2] - bxp[:, 0]) * (bxp[:, 3] - bxp[:, 1]), 1.0
                )
                lm = (bce.sum((1, 2)) / barea) * pos_s
                if cfg.mask_class_w is not None:
                    lm = lm * jnp.asarray(cfg.mask_class_w, pm.dtype)[
                        classes[tgt_s]
                    ]
                l_mask = lm.sum() / n_pos
            else:
                l_mask = jnp.float32(0.0)
            return l_cls, l_box, l_dfl, l_mask

        l_cls, l_box, l_dfl, l_mask = jax.vmap(per_image)(
            box_logits, cls_logits, coefs, proto,
            batch["boxes"], batch["classes"], batch["masks"], batch["valid"],
        )
        mask_w = cfg.mask_w if cfg.segment else 0.0
        loss = (
            cfg.cls_w * l_cls.mean()
            + cfg.box_w * l_box.mean()
            + cfg.dfl_w * l_dfl.mean()
            + mask_w * l_mask.mean()
        )
        metrics = {
            "loss": loss,
            "cls": l_cls.mean(),
            "box": l_box.mean(),
            "dfl": l_dfl.mean(),
            "mask": l_mask.mean(),
        }
        return loss, (mutated["batch_stats"], metrics)

    def _build_step(self):
        tx = self.tx

        @jax.jit
        def step(params, batch_stats, opt_state, batch):
            grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)
            (loss, (new_stats, metrics)), grads = grad_fn(
                params, batch_stats, batch
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_stats, opt_state, metrics

        return step

    def eval_loss(self, batch: Dict[str, np.ndarray]) -> Dict[str, float]:
        """Loss metrics on a batch WITHOUT an optimizer update (validation)."""
        if self._eval_fn is None:

            @jax.jit
            def ev(params, batch_stats, batch):
                _, (_, metrics) = self._loss_fn(params, batch_stats, batch)
                return metrics

            self._eval_fn = ev
        b = {k: jnp.asarray(v) for k, v in batch.items()}
        b["valid"] = b["valid"].astype(jnp.float32)
        metrics = self._eval_fn(self.state.params, self.state.batch_stats, b)
        return {k: float(v) for k, v in metrics.items()}

    def train_step(
        self, batch: Dict[str, np.ndarray], device_metrics: bool = False
    ) -> Dict:
        """One optimizer step. With ``device_metrics`` the metric dict
        holds device arrays (no host readback — each float() is an RPC on
        relay-attached chips); the loop converts only when logging."""
        b = {k: jnp.asarray(v) for k, v in batch.items()}
        b["valid"] = b["valid"].astype(jnp.float32)
        if self.mesh is not None:
            from ..parallel.shard import shard_batch

            b = {k: shard_batch(v, self.mesh) for k, v in b.items()}
        params, stats, opt_state, metrics = self._step_fn(
            self.state.params, self.state.batch_stats, self.state.opt_state, b
        )
        self.state = TrainState(params, stats, opt_state, self.state.step + 1)
        if device_metrics:
            return metrics
        return {k: float(v) for k, v in metrics.items()}


class EMA:
    """Exponential moving average of parameters (deployment weights).

    Decay ramps in (ultralytics-style ``decay * (1 - exp(-step/tau))``):
    with a fixed 0.999 decay over S steps the random init keeps an
    0.999^S weight in the average — 2000 steps leaves 13.5% noise, enough
    to destroy detection quality. The ramp forgets the init quickly while
    still converging to the configured decay.
    """

    def __init__(self, params, decay: float = 0.999, tau: float = 500.0):
        self.decay = decay
        self.tau = tau
        self.step = 0
        self.params = jax.tree_util.tree_map(jnp.asarray, params)

    def update(self, params):
        self.step += 1
        d = self.decay * (1.0 - float(np.exp(-self.step / self.tau)))
        # ONE compiled program per update: a python tree_map would dispatch
        # ~200 tiny ops per step, which dominates step time on
        # relay-attached chips where each dispatch is an RPC
        self.params = _ema_update(self.params, params, jnp.float32(d))
        return self.params


@jax.jit
def _ema_update(ema, params, d):
    return jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema, params
    )


def fit(
    trainer: Trainer,
    data_iter,
    steps: int,
    ema_decay: float = 0.999,
    log_every: int = 50,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 500,
    val_batch: Optional[Dict[str, np.ndarray]] = None,
    val_every: int = 200,
):
    """Minimal training loop: steps batches from ``data_iter`` with EMA,
    periodic checkpointing, and (when ``val_batch`` is given) a held-out
    validation loss logged every ``val_every`` steps. Returns
    (final metrics, EMA params)."""
    import logging

    log = logging.getLogger("eitx.train")
    ema = EMA(trainer.state.params, ema_decay)
    metrics = {}
    for step in range(steps):
        batch = next(data_iter)
        metrics = trainer.train_step(batch, device_metrics=True)
        ema.update(trainer.state.params)
        if log_every and step % log_every == 0:
            metrics = {k: float(v) for k, v in metrics.items()}
            log.info("step %d: %s", step,
                     {k: round(v, 4) for k, v in metrics.items()})
        if val_batch is not None and (step + 1) % val_every == 0:
            vm = trainer.eval_loss(val_batch)
            metrics["val_loss"] = vm["loss"]
            log.info("step %d VAL: %s", step,
                     {k: round(v, 4) for k, v in vm.items()})
        if checkpoint_path and (step + 1) % checkpoint_every == 0:
            from .checkpoint import save_checkpoint

            save_checkpoint(checkpoint_path, trainer.state)
    if checkpoint_path:
        from .checkpoint import save_checkpoint

        save_checkpoint(checkpoint_path, trainer.state)
    metrics = {k: float(v) for k, v in metrics.items()}
    return metrics, ema.params
