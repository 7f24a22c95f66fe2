"""Training checkpoint save/restore (flax msgpack serialization)."""

from __future__ import annotations

import os
import jax
from flax import serialization

from .trainer import TrainState


def save_checkpoint(path: str, state: TrainState) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": state.step,
    }
    data = serialization.to_bytes(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(data)
    os.replace(tmp, path)
    return path


def peek_step(path: str) -> int:
    """The step recorded in a ``.train`` checkpoint.

    Callers that resume MUST read this BEFORE building the Trainer: the
    LR schedule is indexed by the optimizer count restored from the
    checkpoint, so a resumed run has to extend ``total_steps`` past that
    count or the cosine tail evaluates to ~0 and every continued step is
    a no-op.
    """
    with open(path, "rb") as fh:
        tree = serialization.msgpack_restore(fh.read())
    return int(tree["step"])


def load_checkpoint(path: str, like: TrainState, tree=None) -> TrainState:
    """Restore into the structure of an existing TrainState (shapes from a
    freshly built Trainer). Pass ``tree`` (an already msgpack-restored
    payload) to avoid re-reading the file — resume flows decode the
    checkpoint once for the step peek and reuse it here."""
    template = {
        "params": jax.device_get(like.params),
        "batch_stats": jax.device_get(like.batch_stats),
        "opt_state": jax.device_get(like.opt_state),
        "step": like.step,
    }
    if tree is None:
        with open(path, "rb") as fh:
            raw = fh.read()
        restored = serialization.from_bytes(template, raw)
    else:
        restored = serialization.from_state_dict(template, tree)
    return TrainState(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=int(restored["step"]),
    )
