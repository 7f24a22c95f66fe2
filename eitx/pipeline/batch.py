"""Batched, resumable synthetic-dataset generation.

The reference generates one dataset per HTTP request and persists outputs
only (SURVEY section 5: no checkpoint/resume; a failed run loses
everything). Here generation over many subjects is a manifest-driven batch
job: each subject writes an idempotent per-subject .dat shard, a manifest
records status, and re-running skips completed shards — so a failed shard
re-runs without recomputing the rest. Subject meshes bucket to shared
compiled shapes; frames shard across chips when a device mesh is given.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Iterable, Tuple


from ..core.config import ClassMap, SimulationConfig
from ..fem.forward import simulate_eit_monitoring

logger = logging.getLogger("eitx.pipeline.batch")


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest.json")


def load_manifest(out_dir: str) -> Dict:
    path = _manifest_path(out_dir)
    if os.path.exists(path):
        with open(path) as fh:
            return json.load(fh)
    return {"subjects": {}}


def _save_manifest(out_dir: str, manifest: Dict) -> None:
    tmp = _manifest_path(out_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, _manifest_path(out_dir))


def generate_batch(
    subjects: Iterable[Tuple[str, Dict]],
    out_dir: str,
    cfg: SimulationConfig = SimulationConfig(),
    classes: ClassMap = ClassMap(),
    resume: bool = True,
    batch_subjects: bool = True,
) -> Dict:
    """Run EIT monitoring for every (subject_id, mesh_data) pair.

    Writes ``<out_dir>/results_<id>.dat`` per subject plus a manifest.
    Returns the final manifest. Idempotent: completed subjects are skipped
    when ``resume`` is True; failures are recorded and do not abort the
    batch.

    With ``batch_subjects`` (spectral solver only) the pending subjects'
    pencil factorizations run as ONE vmapped setup per node bucket
    (fem.forward.simulate_eit_monitoring_subjects) instead of sequential
    per-subject Cholesky+eigh; on any batched failure the group falls back
    to the per-subject path so one bad mesh cannot poison its bucket.
    """
    from ..fem.forward import simulate_eit_monitoring_subjects
    from ..fem.forward import write_dat

    os.makedirs(out_dir, exist_ok=True)
    manifest = load_manifest(out_dir) if resume else {"subjects": {}}
    pending = []
    for subject_id, mesh_data in subjects:
        entry = manifest["subjects"].get(subject_id)
        out_file = os.path.join(out_dir, f"results_{subject_id}.dat")
        if (
            resume
            and entry
            and entry.get("status") == "done"
            and os.path.exists(out_file)
        ):
            logger.info("skip %s (done)", subject_id)
            continue
        pending.append((subject_id, mesh_data, out_file))

    def run_single(subject_id, mesh_data, out_file):
        t0 = time.time()
        try:
            v, dt = simulate_eit_monitoring(
                mesh_data,
                cfg,
                classes=classes,
                save_to_file=True,
                filename=out_file,
            )
            manifest["subjects"][subject_id] = {
                "status": "done",
                "file": out_file,
                "frames": int(v.shape[0]),
                "row_width": int(v.shape[1]),
                "generation_s": round(dt, 3),
            }
            logger.info("done %s in %.2fs", subject_id, time.time() - t0)
        except Exception as e:
            manifest["subjects"][subject_id] = {
                "status": "failed",
                "error": f"{type(e).__name__}: {e}",
            }
            logger.error("failed %s: %s", subject_id, e)
        _save_manifest(out_dir, manifest)

    use_batched = (
        batch_subjects and len(pending) > 1 and cfg.solver == "spectral"
        and cfg.electrode_model != "cem"
    )
    if use_batched:
        try:
            results = simulate_eit_monitoring_subjects(
                [md for _, md, _ in pending], cfg, classes=classes
            )
            for (subject_id, _, out_file), (v, dt) in zip(pending, results):
                write_dat(out_file, v, n_repeats=cfg.n_spir * cfg.n_minutes)
                manifest["subjects"][subject_id] = {
                    "status": "done",
                    "file": out_file,
                    "frames": int(v.shape[0]),
                    "row_width": int(v.shape[1]),
                    "generation_s": round(dt, 3),
                    "batched": True,
                }
                logger.info("done %s (batched, %.2fs/subject)", subject_id, dt)
            _save_manifest(out_dir, manifest)
            return manifest
        except Exception as e:
            logger.error(
                "batched generation failed (%s); per-subject fallback", e
            )
    for subject_id, mesh_data, out_file in pending:
        run_single(subject_id, mesh_data, out_file)
    return manifest


def main(argv=None):  # pragma: no cover - thin CLI
    """CLI: python -m eitx.pipeline.batch out_dir mesh1.txt mesh2.txt ...

    Each mesh file is a FEMM-format text mesh (subject id = file stem).
    """
    import argparse

    from ..mesh.export import read_mesh_txt

    p = argparse.ArgumentParser(description="eitx batch dataset generation")
    p.add_argument("out_dir")
    p.add_argument("meshes", nargs="+")
    p.add_argument("--n-points", type=int, default=100)
    p.add_argument("--no-resume", action="store_true")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    subjects = []
    for path in args.meshes:
        sid = os.path.splitext(os.path.basename(path))[0]
        subjects.append((sid, read_mesh_txt(path)))
    cfg = SimulationConfig(n_points=args.n_points)
    man = generate_batch(subjects, args.out_dir, cfg, resume=not args.no_resume)
    done = sum(1 for s in man["subjects"].values() if s["status"] == "done")
    print(f"{done}/{len(man['subjects'])} subjects done")


if __name__ == "__main__":  # pragma: no cover
    main()
