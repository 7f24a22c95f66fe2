import json
import os

import numpy as np

from eitx.core.config import SimulationConfig
from eitx.pipeline.batch import generate_batch, load_manifest
from eitx.train import TrainConfig, Trainer, synthetic_ct_batch
from eitx.train.checkpoint import load_checkpoint, save_checkpoint

from meshfix import disk_mesh_with_classes


def _subject(seed):
    nodes, tris, cls = disk_mesh_with_classes(40, 5)
    rng = np.random.default_rng(seed)
    nodes = nodes * (1.0 + 0.02 * rng.standard_normal())
    return {"NODES": nodes.tolist(), "TRIANGLES": tris.tolist(),
            "CLASS": cls.tolist()}


def test_generate_batch_and_resume(tmp_path):
    cfg = SimulationConfig(n_points=3)
    subs = [("s1", _subject(1)), ("s2", _subject(2)),
            ("bad", {"NODES": [], "TRIANGLES": [], "CLASS": []})]
    man = generate_batch(subs, str(tmp_path), cfg)
    assert man["subjects"]["s1"]["status"] == "done"
    assert man["subjects"]["s2"]["status"] == "done"
    assert man["subjects"]["bad"]["status"] == "failed"
    f1 = tmp_path / "results_s1.dat"
    assert f1.exists()
    mtime = f1.stat().st_mtime_ns
    # resume: done subjects skipped (file untouched), failed one retried
    man2 = generate_batch(subs, str(tmp_path), cfg)
    assert f1.stat().st_mtime_ns == mtime
    assert man2["subjects"]["bad"]["status"] == "failed"
    # manifest persisted
    assert load_manifest(str(tmp_path))["subjects"]["s2"]["status"] == "done"


def test_train_checkpoint_roundtrip(tmp_path):
    cfg = TrainConfig(imgsz=64, variant="n", total_steps=5, warmup_steps=0,
                      max_instances=4)
    tr = Trainer(cfg)
    batch = synthetic_ct_batch(batch=2, imgsz=64, max_instances=4)
    tr.train_step(batch)
    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, tr.state)

    tr2 = Trainer(cfg, seed=123)  # different init
    restored = load_checkpoint(path, tr2.state)
    assert restored.step == tr.state.step
    import jax

    a = jax.tree_util.tree_leaves(jax.device_get(tr.state.params))
    b = jax.tree_util.tree_leaves(restored.params)
    assert all(np.allclose(x, y) for x, y in zip(a, b))


def test_generate_batch_batched_spectral(tmp_path):
    """Same-bucket subjects run through the vmapped setup path and write
    identical-format shards; manifest marks them batched."""
    import numpy as np
    from eitx.core.config import SimulationConfig
    from eitx.pipeline.batch import generate_batch, load_manifest
    from meshfix import disk_mesh_with_classes

    subjects = []
    for i, nb in enumerate((40, 48)):
        nodes, tris, cls = disk_mesh_with_classes(nb, 6)
        subjects.append(
            (f"s{i}", {"NODES": nodes * 100.0, "TRIANGLES": tris,
                       "CLASS": cls})
        )
    out = str(tmp_path / "batched")
    cfg = SimulationConfig(n_points=3, pad_nodes_to=512, pad_elems_to=1024)
    man = generate_batch(subjects, out, cfg, batch_subjects=True)
    assert all(s["status"] == "done" for s in man["subjects"].values())
    assert all(s.get("batched") for s in man["subjects"].values())
    man2 = load_manifest(out)
    assert man2 == man
    import os
    rows = open(os.path.join(out, "results_s0.dat")).read().strip().split("\n")
    assert len(rows) == 3 * 12  # n_points * n_spir
    assert len(rows[0].split()) == 208
