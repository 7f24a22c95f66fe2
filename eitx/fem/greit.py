"""GREIT reconstruction: a trained linear imaging matrix for the MXU.

Beyond the reference (which only *generates* forward EIT datasets —
synthetic_datasets_generator.py) and beyond the one-step / Gauss-Newton
solvers in inverse.py: the Graz consensus Reconstruction algorithm for
EIT (Adler et al., "GREIT: a unified approach to 2D linear EIT
reconstruction of lung images", Physiol. Meas. 30 (2009) S35-S55) — the
de-facto standard for real-time lung monitoring, i.e. for exactly the
breathing datasets this framework produces.

GREIT *trains* a linear reconstruction matrix R offline so that R y_k
matches a desired blurred image x_k for a battery of simulated point
targets y_k; online, imaging is a single matmul:

    images (T, P, P)  =  reshape( dv (T, n_meas)  @  R^T )

No per-frame factorization, no iteration — a whole breathing monitoring
reconstructs as ONE (T, n_meas) x (n_meas, P^2) matmul, which is the
MXU's favourite shape.

TPU-first design decisions:
  - Training measurements Y come from the adjoint Jacobian
    (inverse._difference_jacobian) with columns rescaled to equal-AREA
    targets (the raw Jacobian column measures a whole element, so finer
    mesh regions would otherwise train weaker responses).
  - Desired images are compact quadratic bumps max(0, 1 - (d/r)^2)
    rasterized on the pixel grid (smooth edges condition the fit better
    than hard disks).
  - The train solve is one measurement-space Cholesky
    (n_meas^2 ~ 208^2 for the 16-electrode adjacent protocol), identical
    in shape to the DifferenceImager factor.
  - Everything (Jacobian, rasterization, containment mask, solve) is one
    jit program; build once per mesh, reconstruct forever.

No counterpart exists in the reference repo — implemented against the
published algorithm (the reference's datasets are its intended input).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .assembly import element_geometry
from .inverse import _difference_jacobian


@functools.partial(jax.jit, static_argnames=("npx",))
def _pixels_inside(nodes, tris, xs, ys, npx: int):
    """(npx, npx) bool: pixel centers covered by at least one element.

    Barycentric sign test against every element — (P^2, M, 3) ops, tiny
    at GREIT sizes (32^2 x few-thousand elements)."""
    p = nodes[tris]  # (M, 3, 2)
    gx, gy = jnp.meshgrid(xs, ys)  # (npx, npx)
    q = jnp.stack([gx.ravel(), gy.ravel()], -1)  # (P^2, 2)
    a, b, c = p[:, 0], p[:, 1], p[:, 2]  # (M, 2)

    def cross(o, d, pt):  # sign of (d-o) x (pt-o): (P^2, M)
        return (d[:, 0] - o[:, 0]) * (pt[:, None, 1] - o[None, :, 1]) - (
            d[:, 1] - o[:, 1]
        ) * (pt[:, None, 0] - o[None, :, 0])

    s1, s2, s3 = cross(a, b, q), cross(b, c, q), cross(c, a, q)
    inside = ((s1 >= 0) & (s2 >= 0) & (s3 >= 0)) | (
        (s1 <= 0) & (s2 <= 0) & (s3 <= 0)
    )
    # degenerate (zero-area) padding elements have all-zero sign tests
    # and would otherwise claim every pixel
    _, area = element_geometry(nodes, tris)
    inside = inside & (area > 0)[None, :]
    return inside.any(axis=1).reshape(npx, npx)


@functools.partial(jax.jit, static_argnames=("npx",))
def _train_matrix(jac, cent, area, xs, ys, r_img, lam, npx: int,
                  m_real=None):
    """R (P^2, n_meas) from the target battery (one element = one target).

    ``m_real``: number of real (non-padding) elements — the equal-area
    median must ignore the zero-area padding tail or it collapses to 0.
    TRACED (scalar array, not a static int) so one compiled program
    serves every mesh in an element bucket — as a static arg it re-keyed
    a fresh ~27 s remote compile per subject. Padding columns are inert
    downstream: zero Jacobian -> zero Y -> zero W columns -> no
    contribution to R.
    """
    with jax.default_matmul_precision("highest"):
        # equal-area targets: rescale each Jacobian column from "this
        # element's area" to the median target area
        if m_real is None:
            a0 = jnp.median(area)
        else:
            m_real = jnp.minimum(jnp.asarray(m_real), area.shape[0])
            # median of the real prefix of the descending sort; for even
            # m_real average the two middle elements so a padded build
            # matches the unpadded jnp.median path exactly
            srt = jnp.sort(area)[::-1]
            a0 = 0.5 * (srt[(m_real - 1) // 2] + srt[m_real // 2])
        Y = jac * (a0 / jnp.maximum(area, 1e-12))[None, :]  # (n_meas, M)
        # desired images: compact quadratic bump at each target centroid
        gx, gy = jnp.meshgrid(xs, ys)
        pix = jnp.stack([gx.ravel(), gy.ravel()], -1)  # (P^2, 2)
        d2 = ((pix[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        X = jnp.clip(1.0 - d2 / (r_img * r_img), 0.0)  # (P^2, M)
        G = Y @ Y.T
        reg = lam * jnp.mean(jnp.diag(G))
        G = G + reg * jnp.eye(G.shape[0], dtype=G.dtype)
        c, _ = jax.scipy.linalg.cho_factor(G)
        W = jax.scipy.linalg.cho_solve((c, False), Y)  # (n_meas, M)
        return X @ W.T  # (P^2, n_meas)


@jax.jit
def _apply(R, mask, dv):
    with jax.default_matmul_precision("highest"):
        flat = dv.reshape(-1, R.shape[1])
        img = flat @ R.T  # (T, P^2)
        npx = mask.shape[0]
        return img.reshape(*dv.shape[:-1], npx, npx) * mask


@dataclass
class GreitImager:
    """Trained GREIT matrix: per-frame reconstruction is one matvec."""

    R: jnp.ndarray  # (npx*npx, n_meas_total)
    mask: np.ndarray  # (npx, npx) bool, pixels inside the meshed domain
    extent: tuple  # (xmin, xmax, ymin, ymax) of the pixel grid
    npx: int

    def reconstruct(self, dv) -> np.ndarray:
        """dv (..., n_meas_total) -> images (..., npx, npx); pixels
        outside the domain are zeroed. Positive values = conductivity
        INCREASE vs the reference frame (same sign as DifferenceImager)."""
        return np.asarray(
            _apply(self.R, jnp.asarray(self.mask, self.R.dtype),
                   jnp.asarray(dv, jnp.float32))
        )

    def save(self, path: str) -> None:
        """Persist the trained matrix (npz) — rebuild costs a Jacobian +
        train solve per mesh, so serving caches these per mesh bucket."""
        np.savez(
            path, R=np.asarray(self.R), mask=self.mask,
            extent=np.asarray(self.extent, np.float64),
            npx=np.int64(self.npx),
        )

    @classmethod
    def load(cls, path: str) -> "GreitImager":
        with np.load(path) as z:
            return cls(
                R=jnp.asarray(z["R"]), mask=z["mask"].astype(bool),
                extent=tuple(float(v) for v in z["extent"]),
                npx=int(z["npx"]),
            )

    @classmethod
    def build(
        cls,
        nodes: np.ndarray,
        tris: np.ndarray,
        sigma_ref: np.ndarray,
        el_pos,
        ex_mat,
        meas_mat,
        npx: int = 32,
        blur: float = 0.12,
        lam: float = 0.05,
        ref_node: int = 0,
        pad_nodes_to: int = 1024,
        pad_elems_to: int = 8192,
    ) -> "GreitImager":
        """Train R around ``sigma_ref`` on this mesh.

        Args:
          npx: pixel-grid resolution (GREIT's canonical 32).
          blur: desired-image radius as a fraction of the domain's larger
            side (controls the trained point-spread width).
          lam: relative Tikhonov weight of the measurement-space solve
            (scaled by mean diag(Y Y^T), dimensionless); larger = smoother
            images and better noise rejection (GREIT's noise-figure knob).
          pad_nodes_to / pad_elems_to: static-shape buckets (defaults match
            SimulationConfig). Round 3 measured the build at 50 s — all
            remote-compile time, because the unpadded mesh shape made
            every subject a fresh XLA program; bucketing makes builds
            after the first per bucket pure math (one 208^2 Cholesky +
            one N-node factor, ~tens of ms).
        """
        nodes = np.asarray(nodes, np.float64)
        tris = np.asarray(tris, np.int64)
        sigma_ref = np.asarray(sigma_ref, np.float64)
        # real bbox before padding (padding nodes sit at the origin)
        xmin, ymin = nodes.min(0)
        xmax, ymax = nodes.max(0)
        n_real = nodes.shape[0]
        m_real = tris.shape[0]

        def _up(x, m):
            return ((x + m - 1) // m) * m

        n_pad = _up(n_real, max(pad_nodes_to, 1))
        m_pad = _up(tris.shape[0], max(pad_elems_to, 1))
        if n_pad > n_real:
            nodes = np.vstack([nodes, np.zeros((n_pad - n_real, 2))])
        if m_pad > tris.shape[0]:
            extra = m_pad - tris.shape[0]
            # degenerate zero-area elements on node 0: zero stiffness,
            # zero Jacobian column, zero-area (hence zero-weight) target
            tris = np.vstack([tris, np.zeros((extra, 3), np.int64)])
            sigma_ref = np.concatenate(
                [sigma_ref, np.zeros((extra,), np.float64)]
            )
        nodes_j = jnp.asarray(nodes, jnp.float32)
        tris_j = jnp.asarray(tris, jnp.int32)
        jac = _difference_jacobian(
            nodes_j, tris_j, jnp.asarray(sigma_ref, jnp.float32),
            jnp.asarray(el_pos), jnp.asarray(ex_mat), jnp.asarray(meas_mat),
            n_pad, ref_node, n_real=n_real,
        )
        _, area = element_geometry(nodes_j, tris_j)
        cent = nodes_j[tris_j].mean(axis=1)  # (M, 2)
        # pixel CENTERS: half-pixel inset so corners sample inside the bbox
        xs = jnp.linspace(xmin, xmax, npx + 1)[:-1] + (xmax - xmin) / (
            2 * npx
        )
        ys = jnp.linspace(ymin, ymax, npx + 1)[:-1] + (ymax - ymin) / (
            2 * npx
        )
        r_img = jnp.float32(blur * max(xmax - xmin, ymax - ymin))
        R = _train_matrix(jac, cent, area, xs, ys, r_img,
                          jnp.float32(lam), npx, m_real)
        mask = np.asarray(_pixels_inside(nodes_j, tris_j, xs, ys, npx))
        return cls(R=R, mask=mask, extent=(float(xmin), float(xmax),
                                           float(ymin), float(ymax)),
                   npx=npx)


def figures_of_merit(img: np.ndarray, imager: GreitImager,
                     target_xy) -> dict:
    """GREIT figures of merit for ONE reconstructed image of a small
    target (Adler et al. 2009, §Figures of merit), computed on the
    quarter-amplitude pixel set q = {img >= 0.25 max(img)}:

      ar  — amplitude response: sum of image values over q
      pe  — position error: |target center - centroid(q)|, in mesh units
      res — resolution: sqrt(area(q) / area(domain))
      sd  — shape deformation: fraction of q outside the equal-area
            circle centered on q's centroid
      rng — ringing: opposite-sign image mass just outside that circle,
            relative to the in-circle mass

    Host-side numpy analysis (32x32 images — not a device workload).
    """
    img = np.asarray(img, np.float64)
    mask = np.asarray(imager.mask)
    npx = imager.npx
    xmin, xmax, ymin, ymax = imager.extent
    px = xmin + (np.arange(npx) + 0.5) * (xmax - xmin) / npx
    py = ymin + (np.arange(npx) + 0.5) * (ymax - ymin) / npx
    gx, gy = np.meshgrid(px, py)
    pix_area = (xmax - xmin) / npx * (ymax - ymin) / npx

    peak = img.max()
    q = (img >= 0.25 * peak) & mask
    w = img * q
    tot = max(w.sum(), 1e-12)
    cx = (gx * w).sum() / tot
    cy = (gy * w).sum() / tot
    a_q = q.sum() * pix_area
    a_dom = mask.sum() * pix_area
    r_eq = np.sqrt(a_q / np.pi)  # equal-area circle radius
    d = np.hypot(gx - cx, gy - cy)
    inside_c = (d <= r_eq) & mask
    # ringing ring: just outside the equal-area circle (out to 2x radius)
    ring = (d > r_eq) & (d <= 2.0 * r_eq) & mask
    pos_mass = max(img[inside_c].clip(0).sum(), 1e-12)
    return {
        "ar": float(w.sum()),
        "pe": float(np.hypot(cx - target_xy[0], cy - target_xy[1])),
        "res": float(np.sqrt(a_q / a_dom)),
        "sd": float((q & ~inside_c).sum() / max(q.sum(), 1)),
        "rng": float((-img[ring]).clip(0).sum() / pos_mass),
    }


def greit_monitoring(
    mesh_data,
    v_frames: np.ndarray,
    classes=None,
    cfg=None,
    npx: int = 32,
    blur: float = 0.12,
    lam: float = 0.05,
    ref_frame: int = 0,
):
    """GREIT-image a whole monitoring produced by the forward pipeline.

    Mirrors inverse.reconstruct_monitoring but returns pixel-grid images:
      (images (T, npx, npx), imager)
    """
    from .inverse import monitoring_linearization

    info, sigma_ref, el, proto = monitoring_linearization(
        mesh_data, classes, cfg
    )
    imager = GreitImager.build(
        info.node, info.element, sigma_ref, el, proto.ex_mat, proto.meas_mat,
        npx=npx, blur=blur, lam=lam,
    )
    v = jnp.asarray(v_frames, jnp.float32)
    dv = v - v[ref_frame][None]
    return imager.reconstruct(dv), imager
