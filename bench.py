"""eitx benchmark — prints ONE JSON line with the headline metric.

Headline: EIT forward-solve throughput (breathing frames/sec) on the
default monitoring workload over a realistic thorax mesh, steady-state
after compile, INCLUDING the per-subject spectral setup. Baseline: the
in-repo scipy sparse oracle (the same numerical method pyeit runs per
frame in the reference's multiprocessing pool), scaled by the machine's
CPU core count to credit the reference's process-pool parallelism.

Extra keys report segmentation throughput (YOLOv11s-seg at 512^2) and the
mesh/node scale so rounds are comparable.
"""

import json
import os
import sys
import time

import numpy as np


def build_thorax_mesh(lc=7.0):
    from eitx.mesh import create_mesh

    def ellipse(cid, cx, cy, rx, ry, n=80):
        th = np.linspace(0, 2 * np.pi, n, endpoint=False)
        pts = np.stack([cx + rx * np.cos(th), cy + ry * np.sin(th)], 1)
        return f"{cid} " + " ".join(f"{x:.1f} {y:.1f}" for x, y in pts)

    polygons = [
        ellipse(4, 256, 256, 200, 150, 90),
        ellipse(3, 256, 256, 192, 142, 70),
        ellipse(1, 256, 256, 170, 125, 70),
        ellipse(2, 175, 250, 55, 75, 40),
        ellipse(2, 337, 250, 55, 75, 40),
        ellipse(0, 256, 330, 22, 18, 24),
    ]
    _, mesh = create_mesh(
        ["0.75", "0.75"], polygons, lc=lc,
        show_meshing_result_method="no",
    )
    return mesh


def bench_eit(mesh, frames=1200, repeats=3):
    import jax
    import jax.numpy as jnp

    from eitx.core.config import ClassMap
    from eitx.fem.assembly import ClassStiffness
    from eitx.fem.electrodes import place_electrodes_equal_spacing
    from eitx.fem.forward import build_sigma_frames, compact_mesh_nodes, prepare_mesh_info
    from eitx.fem.protocol import create_protocol
    from eitx.fem.spectral import LowRankSpectralSolver
    from eitx.physio.materials import generate_material_tables, tissue_conductivities
    from eitx.physio.spirometry import conductivity_schedule

    classes = ClassMap()
    info = compact_mesh_nodes(prepare_mesh_info(mesh, classes))
    mats = generate_material_tables()
    _, condspir = conductivity_schedule(12, frames, 5e4, mats)
    base = tissue_conductivities(mats, 5e4, classes.id_to_name())
    sigma = build_sigma_frames(condspir, base, classes)
    el = place_electrodes_equal_spacing(
        info.node, info.element, 16, starting_angle=np.pi
    )
    proto = create_protocol(16, 1, 1, "std")
    # Single-subject job: pad to the subject's own fine bucket (the coarse
    # 1024 default exists for cross-subject compile reuse; here it would
    # only inflate the one-off eigh from N=2304 to N=3072).
    cs = ClassStiffness.build(
        info.node, info.element, info.cond, n_classes=5,
        pad_nodes_to=256, pad_elems_to=2048,
    )
    alphas = jnp.asarray(sigma[:, classes.name_to_id()["lung"]], jnp.float32)

    def full_job():
        solver = LowRankSpectralSolver.build(
            cs, sigma[0], classes.name_to_id()["lung"], el,
            proto.ex_mat, proto.meas_mat, float(np.mean(sigma[:, 2])),
        )
        return solver.solve(alphas)

    # warm up compiles (setup + solve)
    v = full_job()
    v.block_until_ready()
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        v = full_job()
        v.block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)

    # marginal solve-only rate: once a subject's pencil is factored, how
    # fast do additional breathing frames come? (long monitorings /
    # N_minutes >> 1 amortize here)
    solver = LowRankSpectralSolver.build(
        cs, sigma[0], classes.name_to_id()["lung"], el,
        proto.ex_mat, proto.meas_mat, float(np.mean(sigma[:, 2])),
    )
    big = jnp.tile(alphas, 10)  # 12000 frames
    solver.solve(big).block_until_ready()
    t0 = time.perf_counter()
    np.asarray(solver.solve(big).sum())
    solve_only = big.shape[0] / (time.perf_counter() - t0)
    return frames / best, info.node.shape[0], np.asarray(v), solve_only


def bench_eit_oracle(mesh, frames=7):
    """Single-core scipy frames/sec (pyeit-equivalent numerical path).

    Median per-frame time with the first (cache-cold) frame dropped, so
    concurrent host load cannot skew the baseline much in either
    direction."""
    from eitx.core.config import ClassMap
    from eitx.fem.electrodes import place_electrodes_equal_spacing
    from eitx.fem.forward import compact_mesh_nodes, prepare_mesh_info
    from eitx.fem.oracle import forward_solve_oracle
    from eitx.fem.protocol import create_protocol

    info = compact_mesh_nodes(prepare_mesh_info(mesh, ClassMap()))
    el = place_electrodes_equal_spacing(
        info.node, info.element, 16, starting_angle=np.pi
    )
    proto = create_protocol(16, 1, 1, "std")
    cond = np.where(info.cond == 2, 0.15, 0.3).astype(np.float64)
    per_frame = []
    for i in range(frames):
        t0 = time.perf_counter()
        forward_solve_oracle(
            info.node, info.element, cond * (1 + 0.1 * i), el,
            proto.ex_mat, proto.meas_mat,
        )
        per_frame.append(time.perf_counter() - t0)
    return 1.0 / float(np.median(per_frame[1:]))


def bench_segmentation(batch=128, imgsz=512, repeats=5):
    """Returns (e2e_slices_per_sec, device_slices_per_sec, link_mbps).

    End-to-end includes host<->device transfer, streamed/overlapped in
    chunks (segment_labels). On relay-attached dev chips the link caps at
    ~40 MB/s once any program has executed, so the e2e ceiling here is
    link_mbps / bytes_per_slice; device compute is the chip's own
    throughput (input resident, scalar readback forces execution) — the
    number that holds on production-attached TPUs where the host link
    runs at PCIe rates.
    """
    import jax
    import jax.numpy as jnp

    from eitx.models.yolo.infer import TissueSegmenter

    seg = TissueSegmenter(imgsz=imgsz, max_det=64, dtype="bfloat16")
    imgs = (np.random.default_rng(0).uniform(0, 255, (batch, imgsz, imgsz))
            ).astype(np.uint8)
    seg.segment_labels(imgs)  # compile
    e2e = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        seg.segment_labels(imgs)
        e2e.append(time.perf_counter() - t0)
    fn = seg._segment_labels_fn
    x_dev = jnp.asarray(imgs)
    np.asarray(fn(x_dev).sum())  # warm
    dev = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(fn(x_dev).sum())
        dev.append(time.perf_counter() - t0)
    # measured post-execution h2d bandwidth (the e2e bound on this box)
    xfer = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_put(imgs).block_until_ready()
        xfer.append(time.perf_counter() - t0)
    link_mbps = imgs.nbytes / 1e6 / min(xfer)
    return batch / min(e2e), batch / min(dev), link_mbps


def main():
    from eitx.core.cache import enable_compilation_cache

    enable_compilation_cache()
    t_start = time.time()
    mesh = build_thorax_mesh()
    frames_per_sec, n_nodes, v, solve_only_fps = bench_eit(mesh)
    oracle_fps = bench_eit_oracle(mesh)
    # Credit the reference's multiprocessing pool at its DOCUMENTED min
    # spec (8-core x86, README.en.md:28-32) even when this host has fewer
    # cores, so vs_baseline is never flattered by a small host.
    baseline_cores = max(8, os.cpu_count() or 1)
    baseline = oracle_fps * baseline_cores
    try:
        seg_fps, seg_dev_fps, link_mbps = bench_segmentation()
    except Exception as e:  # segmentation bench is best-effort
        print(f"segmentation bench skipped: {e}", file=sys.stderr)
        seg_fps, seg_dev_fps, link_mbps = None, None, None
    out = {
        "metric": "eit_forward_frames_per_sec",
        "value": round(frames_per_sec, 1),
        "unit": "frames/sec",
        "vs_baseline": round(frames_per_sec / baseline, 2),
        "baseline_frames_per_sec": round(baseline, 1),
        "baseline_method": "scipy sparse LU oracle x max(8, cpu_count) "
                           f"({baseline_cores} cores; ref min spec is "
                           "8-core)",
        "mesh_nodes": int(n_nodes),
        "workload_frames": 1200,
        "spectral_solve_only_frames_per_sec": round(solve_only_fps, 1),
        "segmentation_slices_per_sec_e2e": (
            round(seg_fps, 1) if seg_fps else None
        ),
        "segmentation_slices_per_sec_device": (
            round(seg_dev_fps, 1) if seg_dev_fps else None
        ),
        "h2d_link_mbytes_per_sec": (
            round(link_mbps, 1) if link_mbps else None
        ),
        "segmentation_link_ceiling_slices_per_sec": (
            round(link_mbps * 1e6 / (512 * 512), 1) if link_mbps else None
        ),
        "bench_wall_s": round(time.time() - t_start, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
