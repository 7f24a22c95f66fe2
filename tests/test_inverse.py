"""Inverse difference-imaging reconstruction tests."""

import numpy as np
import jax.numpy as jnp

from eitx.fem import create_protocol, place_electrodes_equal_spacing
from eitx.fem.inverse import DifferenceImager, reconstruct_monitoring
from eitx.fem.oracle import forward_solve_oracle

from meshfix import disk_mesh, disk_mesh_with_classes


def test_difference_imaging_localizes_perturbation():
    """A conductivity blob perturbation must reconstruct near its true
    location with positive correlation to the true change."""
    nodes, tris = disk_mesh(48, 7)
    el = place_electrodes_equal_spacing(nodes, tris, 16, starting_angle=np.pi)
    proto = create_protocol(16, 1, 1, "std")
    sigma0 = np.full(tris.shape[0], 0.3)
    cent = nodes[tris].mean(axis=1)
    blob = np.linalg.norm(cent - np.array([0.35, 0.2]), axis=1) < 0.25
    sigma1 = sigma0.copy()
    sigma1[blob] = 0.45  # +50% conductive inclusion

    v0 = forward_solve_oracle(nodes, tris, sigma0, el, proto.ex_mat,
                              proto.meas_mat).ravel()
    v1 = forward_solve_oracle(nodes, tris, sigma1, el, proto.ex_mat,
                              proto.meas_mat).ravel()

    imager = DifferenceImager.build(
        nodes, tris, sigma0, el, proto.ex_mat, proto.meas_mat, lam=1e-3
    )
    ds = np.asarray(imager.reconstruct(jnp.asarray(v1 - v0)))
    assert ds.shape == (tris.shape[0],)
    true_ds = sigma1 - sigma0
    corr = np.corrcoef(ds, true_ds)[0, 1]
    assert corr > 0.4, corr
    # localization: the reconstruction's center of mass (positive part)
    # lands near the true blob center
    pos = np.clip(ds, 0, None)
    com = (cent * pos[:, None]).sum(0) / max(pos.sum(), 1e-9)
    assert np.linalg.norm(com - np.array([0.35, 0.2])) < 0.25, com


def test_jacobian_first_order_accuracy():
    """J dsigma must predict the actual voltage change to first order."""
    nodes, tris = disk_mesh(40, 5)
    el = place_electrodes_equal_spacing(nodes, tris, 16, starting_angle=np.pi)
    proto = create_protocol(16, 1, 1, "std")
    sigma0 = np.full(tris.shape[0], 0.3)
    rng = np.random.default_rng(0)
    dsig = 1e-4 * rng.standard_normal(tris.shape[0])

    imager = DifferenceImager.build(
        nodes, tris, sigma0, el, proto.ex_mat, proto.meas_mat
    )
    v0 = forward_solve_oracle(nodes, tris, sigma0, el, proto.ex_mat,
                              proto.meas_mat).ravel()
    v1 = forward_solve_oracle(nodes, tris, sigma0 + dsig, el, proto.ex_mat,
                              proto.meas_mat).ravel()
    pred = np.asarray(imager.jac) @ dsig
    actual = v1 - v0
    rel = np.linalg.norm(pred - actual) / np.linalg.norm(actual)
    assert rel < 0.05, rel


def test_reconstruct_monitoring_breathing():
    """End-to-end: forward-simulate a breathing monitoring on a classed
    mesh, reconstruct, and check the lung region modulates most."""
    from eitx.core.config import SimulationConfig
    from eitx.fem import simulate_eit_monitoring

    nodes, tris, cls = disk_mesh_with_classes(48, 6)
    mesh = {"NODES": nodes * 100.0, "TRIANGLES": tris, "CLASS": cls}
    cfg = SimulationConfig(n_points=8, pad_nodes_to=256, pad_elems_to=512)
    v, _ = simulate_eit_monitoring(mesh, cfg)
    ds, imager = reconstruct_monitoring(mesh, v, cfg=cfg)
    assert ds.shape[0] == 8 and np.isfinite(ds).all()
    # breathing modulates: per-element variance over time is largest in
    # (or adjacent to) the lung region
    var = ds.var(axis=0)
    lung = cls == 2
    assert var[lung].mean() > var[~lung].mean(), (
        var[lung].mean(), var[~lung].mean()
    )


def test_gauss_newton_absolute_recovers_inclusion():
    """Absolute Gauss-Newton imaging: simulate voltages for a disk with a
    conductive inclusion, reconstruct from the voltages ALONE (no
    reference frame), and check the inclusion localizes and the data
    residual drops monotonically-ish from the homogeneous start."""
    from eitx.fem.inverse import gauss_newton_absolute

    nodes, tris = disk_mesh(48, 7)
    el = place_electrodes_equal_spacing(nodes, tris, 16, starting_angle=np.pi)
    proto = create_protocol(16, 1, 1, "std")
    M = tris.shape[0]
    cent = nodes[tris].mean(1)
    sigma_true = np.full((M,), 0.5)
    blob = np.linalg.norm(cent - np.array([0.35, 0.2]), axis=1) < 0.25
    sigma_true[blob] = 1.5
    v = forward_solve_oracle(
        nodes, tris, sigma_true, el, proto.ex_mat, proto.meas_mat
    )
    sigma, res = gauss_newton_absolute(
        nodes, tris, np.asarray(v), el, proto.ex_mat, proto.meas_mat,
        n_iter=6, lam=1e-2,
    )
    assert res[-1] < 0.2 * res[0], res  # data misfit shrinks a lot
    # the reconstructed blob region must be clearly more conductive than
    # the background
    assert sigma[blob].mean() > 1.25 * sigma[~blob].mean(), (
        sigma[blob].mean(), sigma[~blob].mean(),
    )

def test_greit_localizes_target_on_pixel_grid():
    """GREIT (trained linear matrix): a conductive blob must image as a
    positive peak at the right pixel, with the background quiet and every
    outside-domain pixel exactly zero."""
    from eitx.fem.greit import GreitImager

    nodes, tris = disk_mesh(48, 7)
    el = place_electrodes_equal_spacing(nodes, tris, 16, starting_angle=np.pi)
    proto = create_protocol(16, 1, 1, "std")
    sigma0 = np.full(tris.shape[0], 0.3)
    cent = nodes[tris].mean(axis=1)
    true_c = np.array([0.35, 0.2])
    blob = np.linalg.norm(cent - true_c, axis=1) < 0.25
    sigma1 = sigma0.copy()
    sigma1[blob] = 0.45

    v0 = forward_solve_oracle(nodes, tris, sigma0, el, proto.ex_mat,
                              proto.meas_mat).ravel()
    v1 = forward_solve_oracle(nodes, tris, sigma1, el, proto.ex_mat,
                              proto.meas_mat).ravel()

    im = GreitImager.build(nodes, tris, sigma0, el, proto.ex_mat,
                           proto.meas_mat, npx=32)
    img = im.reconstruct(v1 - v0)
    assert img.shape == (32, 32)
    assert np.isfinite(img).all()
    # the domain mask is a disk: ~pi/4 of the square grid, and zeroed out
    frac = im.mask.mean()
    assert 0.6 < frac < 0.9, frac
    assert (img[~im.mask] == 0).all()
    # peak pixel within the desired-image radius of the true center
    iy, ix = np.unravel_index(np.argmax(img), img.shape)
    xmin, xmax, ymin, ymax = im.extent
    px = xmin + (ix + 0.5) * (xmax - xmin) / 32
    py = ymin + (iy + 0.5) * (ymax - ymin) / 32
    assert np.hypot(px - true_c[0], py - true_c[1]) < 0.35, (px, py)
    # conductive increase images positive, and the peak dominates the
    # opposite half of the domain (quiet background)
    peak = img[iy, ix]
    assert peak > 0
    far = im.mask & (np.add.outer(
        (ymin + (np.arange(32) + 0.5) * (ymax - ymin) / 32 - true_c[1]) ** 2,
        (xmin + (np.arange(32) + 0.5) * (xmax - xmin) / 32 - true_c[0]) ** 2,
    ) > 1.0)
    assert np.abs(img[far]).max() < 0.5 * peak


def test_greit_monitoring_breathing_modulates_lungs():
    """End-to-end: GREIT-image a simulated breathing monitoring; the
    pixels over the lung region must modulate more than the rest."""
    from eitx.core.config import SimulationConfig
    from eitx.fem import greit_monitoring, simulate_eit_monitoring

    nodes, tris, cls = disk_mesh_with_classes(48, 6)
    mesh = {"NODES": nodes * 100.0, "TRIANGLES": tris, "CLASS": cls}
    cfg = SimulationConfig(n_points=8, pad_nodes_to=256, pad_elems_to=512)
    v, _ = simulate_eit_monitoring(mesh, cfg)
    imgs, im = greit_monitoring(mesh, v, cfg=cfg)
    assert imgs.shape == (8, 32, 32) and np.isfinite(imgs).all()
    # map lung-element centroids to pixel indices
    cent = (nodes * 100.0)[tris].mean(axis=1)
    xmin, xmax, ymin, ymax = im.extent
    ix = np.clip(((cent[:, 0] - xmin) / (xmax - xmin) * 32).astype(int), 0, 31)
    iy = np.clip(((cent[:, 1] - ymin) / (ymax - ymin) * 32).astype(int), 0, 31)
    lungpix = np.zeros((32, 32), bool)
    lungpix[iy[cls == 2], ix[cls == 2]] = True
    var = imgs.var(axis=0)
    assert var[lungpix].mean() > var[im.mask & ~lungpix].mean()


def test_greit_noise_robustness():
    """GREIT's regularized train must keep localizing under measurement
    noise at 20% of the signal's std (the regime where the raw
    measurement-space inverse goes unstable)."""
    from eitx.fem.greit import GreitImager

    nodes, tris = disk_mesh(48, 7)
    el = place_electrodes_equal_spacing(nodes, tris, 16, starting_angle=np.pi)
    proto = create_protocol(16, 1, 1, "std")
    sigma0 = np.full(tris.shape[0], 0.3)
    cent = nodes[tris].mean(axis=1)
    true_c = np.array([0.35, 0.2])
    blob = np.linalg.norm(cent - true_c, axis=1) < 0.25
    sigma1 = sigma0.copy()
    sigma1[blob] = 0.45
    v0 = forward_solve_oracle(nodes, tris, sigma0, el, proto.ex_mat,
                              proto.meas_mat).ravel()
    v1 = forward_solve_oracle(nodes, tris, sigma1, el, proto.ex_mat,
                              proto.meas_mat).ravel()
    dv = v1 - v0
    rng = np.random.default_rng(7)
    noisy = dv + 0.2 * dv.std() * rng.standard_normal(dv.shape)

    im = GreitImager.build(nodes, tris, sigma0, el, proto.ex_mat,
                           proto.meas_mat, npx=32)
    img = im.reconstruct(noisy)
    iy, ix = np.unravel_index(np.argmax(img), img.shape)
    xmin, xmax, ymin, ymax = im.extent
    px = xmin + (ix + 0.5) * (xmax - xmin) / 32
    py = ymin + (iy + 0.5) * (ymax - ymin) / 32
    assert np.hypot(px - true_c[0], py - true_c[1]) < 0.35, (px, py)


def test_greit_figures_of_merit_radial_sweep():
    """GREIT FOMs (Adler et al. 2009) over a radial target sweep on the
    unit disk: position error bounded everywhere, resolution in the
    published ballpark, modest ringing, and amplitude response uniform
    within a factor ~2 from center to 0.7R (the paper's uniformity aim)."""
    from eitx.fem.greit import GreitImager, figures_of_merit

    nodes, tris = disk_mesh(48, 7)
    el = place_electrodes_equal_spacing(nodes, tris, 16, starting_angle=np.pi)
    proto = create_protocol(16, 1, 1, "std")
    sigma0 = np.full(tris.shape[0], 0.3)
    cent = nodes[tris].mean(axis=1)
    v0 = forward_solve_oracle(nodes, tris, sigma0, el, proto.ex_mat,
                              proto.meas_mat).ravel()
    im = GreitImager.build(nodes, tris, sigma0, el, proto.ex_mat,
                           proto.meas_mat, npx=32)

    foms = []
    for r in (0.0, 0.3, 0.5, 0.7):
        tc = np.array([r, 0.0])
        blob = np.linalg.norm(cent - tc, axis=1) < 0.18
        sigma1 = sigma0.copy()
        sigma1[blob] = 0.42
        v1 = forward_solve_oracle(nodes, tris, sigma1, el, proto.ex_mat,
                                  proto.meas_mat).ravel()
        img = im.reconstruct(v1 - v0)
        foms.append(figures_of_merit(img, im, tc))

    for r, f in zip((0.0, 0.3, 0.5, 0.7), foms):
        assert f["pe"] < 0.22, (r, f)          # within ~1 target radius
        assert 0.1 < f["res"] < 0.6, (r, f)
        assert f["rng"] < 0.8, (r, f)
        assert f["sd"] < 0.5, (r, f)
        assert f["ar"] > 0, (r, f)
    ars = np.array([f["ar"] for f in foms])
    assert ars.max() / ars.min() < 2.5, ars    # amplitude uniformity


def test_greit_save_load_roundtrip(tmp_path):
    """A persisted GREIT matrix reconstructs bit-identically after load."""
    from eitx.fem.greit import GreitImager

    nodes, tris = disk_mesh(40, 5)
    el = place_electrodes_equal_spacing(nodes, tris, 16, starting_angle=np.pi)
    proto = create_protocol(16, 1, 1, "std")
    sigma0 = np.full(tris.shape[0], 0.3)
    im = GreitImager.build(nodes, tris, sigma0, el, proto.ex_mat,
                           proto.meas_mat, npx=32)
    path = str(tmp_path / "greit.npz")
    im.save(path)
    im2 = GreitImager.load(path)
    assert im2.npx == im.npx and im2.extent == im.extent
    assert (im2.mask == im.mask).all()
    dv = np.random.default_rng(1).standard_normal(
        (3, np.asarray(im.R).shape[1])).astype(np.float32)
    assert (im2.reconstruct(dv) == im.reconstruct(dv)).all()
