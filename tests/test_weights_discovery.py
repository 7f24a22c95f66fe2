"""Serving-slot checkpoint discovery (eitx/core/weights.py).

The reference hardcodes three weight paths (kt_service_config.py:1-3);
eitx resolves each serving slot to the best trained checkpoint present,
preferring the s-variant (the reference's production capacity class)
over the n fallback.
"""

import os

from eitx.core.weights import find_checkpoint, repo_weights_dir


def test_prefers_s_over_n(tmp_path):
    for name in ("tissue_n_256.msgpack", "tissue_s_256.msgpack"):
        (tmp_path / name).write_bytes(b"x")
    assert find_checkpoint("tissue", 256, str(tmp_path)).endswith(
        "tissue_s_256.msgpack")


def test_falls_back_to_n(tmp_path):
    (tmp_path / "ribs_n_640.msgpack").write_bytes(b"x")
    assert find_checkpoint("ribs", 640, str(tmp_path)).endswith(
        "ribs_n_640.msgpack")


def test_missing_slot_is_none(tmp_path):
    assert find_checkpoint("tissue", 512, str(tmp_path)) is None


def test_repo_weights_dir_points_at_repo():
    d = repo_weights_dir()
    assert os.path.basename(d) == "weights"
    assert os.path.isdir(os.path.dirname(d))
