"""Ultralytics ``.pt`` checkpoint -> flax parameter tree.

The reference loads three released YOLOv11s checkpoints through the
ultralytics runtime (ai_tools.py:69-71, kt_service_config.py:1-3). Here
the archive is read WITHOUT torch or ultralytics installed (ptread.py
parses the zip/pickle format directly into numpy), then the nn.Module
stub graph is walked via ``_parameters``/``_buffers``/``_modules`` to
recover the state dict. Names map mechanically onto the flax tree
(model.py keeps the layer indices), with layout transposes OIHW -> HWIO
for convs and (I, O, kh, kw) -> (kh, kw, O, I) for the proto
deconvolution.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ...core.errors import ModelError


def _as_f32(t) -> np.ndarray:
    a = np.asarray(t)
    if a.dtype != np.float32 and np.issubdtype(a.dtype, np.floating):
        a = a.astype(np.float32)
    return a


def _collect_tensors(obj, prefix: str, out: Dict[str, np.ndarray]) -> None:
    """Walk an nn.Module stub graph via _parameters/_buffers/_modules."""
    d = getattr(obj, "__dict__", None)
    if not isinstance(d, dict):
        return
    for slot in ("_parameters", "_buffers"):
        entries = d.get(slot)
        if entries:
            for name, t in dict(entries).items():
                if isinstance(t, np.ndarray):
                    out[prefix + name] = _as_f32(t)
    modules = d.get("_modules")
    if modules:
        for name, child in dict(modules).items():
            if child is not None:
                _collect_tensors(child, prefix + name + ".", out)


def load_torch_state(pt_path: str) -> Dict[str, np.ndarray]:
    """Read an ultralytics (or raw) .pt file into {name: float32 array}.

    Torch-free: the zip/pickle archive is parsed by ptread.load_pt_archive,
    so conversion runs inside the deployment image (which installs no
    torch). Prefers the 'ema' weights when present (ultralytics'
    attempt_load does the same).
    """
    from .ptread import load_pt_archive

    try:
        ckpt = load_pt_archive(pt_path)
    except Exception as e:
        raise ModelError(f"cannot unpickle checkpoint {pt_path}: {e}") from e
    state: Dict[str, np.ndarray] = {}
    if isinstance(ckpt, dict) and not all(
        isinstance(v, np.ndarray) for v in ckpt.values()
    ):
        for source in ("ema", "model"):
            mod = ckpt.get(source)
            if mod is not None and not isinstance(mod, np.ndarray):
                _collect_tensors(mod, "", state)
                if state:
                    break
    elif isinstance(ckpt, dict):  # raw state dict
        for k, v in ckpt.items():
            if isinstance(v, np.ndarray):
                state[k] = _as_f32(v)
    if not state:
        raise ModelError(f"no tensors found in checkpoint {pt_path}")
    return state


def _flax_path(torch_key: str) -> Tuple[Tuple[str, ...], str]:
    """torch state name -> (flax module path, leaf kind).

    Numeric components merge into the preceding name (``m.0`` -> ``m_0``);
    ``proto.cvN``/``proto.upsample`` and ``ffn.N`` merge too (module names
    in model.py are flat at those points).
    """
    tokens = torch_key.split(".")
    leaf = tokens[-1]
    tokens = tokens[:-1]
    path = []
    for t in tokens:
        if t.isdigit() and path:
            path[-1] = f"{path[-1]}_{t}"
        elif t in ("cv1", "cv2", "cv3", "upsample") and path and path[-1] == "proto":
            path[-1] = f"proto_{t}"
        else:
            path.append(t)
    return tuple(path), leaf


def convert_state_to_variables(
    state: Dict[str, np.ndarray], template_vars: Dict
) -> Dict:
    """Fill a flax variables template (from model.init) with torch weights.

    Raises ModelError listing any template leaf left unfilled or any
    checkpoint tensor with no destination (DFL's fixed kernel and
    num_batches_tracked counters are skipped by design).
    """
    import jax

    params = jax.tree_util.tree_map(np.array, template_vars["params"])
    batch_stats = jax.tree_util.tree_map(
        np.array, template_vars.get("batch_stats", {})
    )
    filled = set()
    unmatched = []

    def set_leaf(tree, path, value, torch_key):
        node = tree
        for p in path[:-1]:
            if not isinstance(node, dict) or p not in node:
                return False
            node = node[p]
        leaf_name = path[-1]
        if not isinstance(node, dict) or leaf_name not in node:
            return False
        if node[leaf_name].shape != value.shape:
            raise ModelError(
                f"shape mismatch for {torch_key}: checkpoint "
                f"{value.shape} vs model {node[leaf_name].shape}"
            )
        node[leaf_name] = value.astype(node[leaf_name].dtype)
        filled.add(tuple(path))
        return True

    for key, value in state.items():
        if key.endswith("num_batches_tracked") or ".dfl." in key:
            continue
        path, leaf = _flax_path(key)
        ok = False
        if leaf == "weight":
            if value.ndim == 4:
                mod = path[-1] if path else ""
                if "upsample" in mod:
                    # torch ConvTranspose2d (I, O, kh, kw) -> flax
                    # transpose_kernel=True layout (kh, kw, O, I)
                    w = value.transpose(2, 3, 1, 0)
                else:
                    # torch Conv2d (O, I/g, kh, kw) -> (kh, kw, I/g, O)
                    w = value.transpose(2, 3, 1, 0)
                ok = set_leaf(params, (*path, "kernel"), w, key)
            elif value.ndim == 1:  # batchnorm gamma
                ok = set_leaf(params, (*path, "scale"), value, key)
        elif leaf == "bias":
            ok = set_leaf(params, (*path, "bias"), value, key)
        elif leaf == "running_mean":
            ok = set_leaf(batch_stats, (*path, "mean"), value, key)
        elif leaf == "running_var":
            ok = set_leaf(batch_stats, (*path, "var"), value, key)
        if not ok:
            unmatched.append(key)
    if unmatched:
        raise ModelError(
            f"{len(unmatched)} checkpoint tensors had no destination, e.g. "
            + ", ".join(unmatched[:8])
        )
    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def convert_ultralytics_checkpoint(
    pt_path: str, model, imgsz: int = 512, n_channels: int = 3
) -> Dict:
    """Load a .pt checkpoint into variables for ``model`` (a YoloV11)."""
    import jax
    import jax.numpy as jnp

    state = load_torch_state(pt_path)
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, imgsz, imgsz, n_channels), jnp.float32),
    )
    template = jax.tree_util.tree_map(np.asarray, template)
    # unfreeze-style plain dicts
    template = jax.tree_util.tree_map(
        lambda x: x, jax.device_get(template)
    )
    template = _to_mutable(template)
    return convert_state_to_variables(state, template)


def _to_mutable(tree):
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def restore_checkpoint_tree(path: str) -> Dict:
    """Read + msgpack-decode an eitx checkpoint once; callers share the
    restored tree between peek_checkpoint_meta and load_weights so runner
    construction doesn't pay checkpoint I/O twice."""
    from flax import serialization

    with open(path, "rb") as fh:
        return serialization.msgpack_restore(fh.read())


def load_eitx_checkpoint(path: str, tree: Dict = None) -> Dict:
    """Load an eitx-native msgpack checkpoint into inference variables.

    Accepts either a deployment dict {params[, batch_stats]} (what
    scripts/train_tissue.py saves from the EMA weights) or a full
    TrainState payload (train/checkpoint.py) — opt_state/step are dropped.
    """
    if tree is None:
        tree = restore_checkpoint_tree(path)
    if "params" not in tree:
        raise ModelError(f"checkpoint {path} has no 'params' tree")
    out = {"params": tree["params"]}
    if tree.get("batch_stats"):
        out["batch_stats"] = tree["batch_stats"]
    return out


def peek_checkpoint_meta(path: str, tree: Dict = None) -> Dict:
    """Read the 'meta' dict of an eitx msgpack checkpoint without building
    a model ({} for .pt archives or checkpoints without meta)."""
    if path.endswith(".pt"):
        return {}
    if tree is None:
        tree = restore_checkpoint_tree(path)
    meta = tree.get("meta")
    return dict(meta) if isinstance(meta, dict) else {}


def merge_state_dict(template, state):
    """Tolerant warm start: copy every leaf of ``state`` whose path AND
    shape match into ``template`` (a fresh-init param/stat tree); every
    other template leaf keeps its fresh initialization.

    ``flax.serialization.from_state_dict`` demands an exact structural
    match, which breaks warm starting across architecture extensions
    (e.g. a ``proto_stride=2`` graph adds proto_upsample2/proto_cv2b and
    reshapes proto_cv3 — everything else is transferable). Returns
    ``(merged, copied_paths, skipped_paths, unused_paths)``: ``skipped``
    are template leaves left at fresh init, ``unused`` are CHECKPOINT
    leaves with no matching/same-shape home in the template — a non-empty
    ``unused`` usually means trained weights are being dropped (e.g.
    warm-starting a stride-4 graph from a stride-2 checkpoint because
    ``--proto-stride 2`` was forgotten), so callers should log it loudly.
    """
    from collections.abc import Mapping

    copied, skipped, unused = [], [], []

    def rec(t, s, path):
        if isinstance(t, Mapping):
            out = {}
            for k, v in t.items():
                if isinstance(s, Mapping) and k in s:
                    out[k] = rec(v, s[k], path + (k,))
                else:
                    skipped.append("/".join(path + (k,)))
                    out[k] = v
            if isinstance(s, Mapping):
                for k in s:
                    if k not in t:
                        unused.append("/".join(path + (k,)))
            return out
        arr = np.asarray(s)
        tarr = np.asarray(t)
        if tuple(arr.shape) == tuple(tarr.shape):
            copied.append("/".join(path))
            return arr.astype(tarr.dtype)
        skipped.append("/".join(path))
        unused.append("/".join(path))
        return t

    merged = rec(dict(template), state, ())
    return merged, copied, skipped, unused


def load_weights(pt_path: str, model, imgsz: int = 512, tree: Dict = None):
    """Convenience: checkpoint path -> jnp variables ready for apply().

    ``.pt`` files go through the torch-archive converter; anything else is
    treated as an eitx-native msgpack checkpoint (pass ``tree`` to reuse
    an already-restored payload).
    """
    import jax.numpy as jnp
    import jax

    if pt_path.endswith(".pt"):
        variables = convert_ultralytics_checkpoint(pt_path, model, imgsz)
    else:
        variables = load_eitx_checkpoint(pt_path, tree=tree)
    return jax.tree_util.tree_map(jnp.asarray, variables)
