import numpy as np
import jax.numpy as jnp
import pytest

from eitx.mesh.pallas_pip import pallas_available, points_in_polys_pallas
from eitx.mesh.classify import _points_in_polys


@pytest.mark.skipif(not pallas_available(), reason="pallas unavailable")
def test_pallas_pip_matches_jnp_reference():
    rng = np.random.default_rng(0)
    # two polygons: a square and a triangle, padded to equal P
    sq = np.array([[10, 10], [90, 10], [90, 90], [10, 90]], float)
    tri = np.array([[120, 20], [180, 20], [150, 80]], float)
    P = 8
    polys = np.zeros((2, P, 2))
    polys[0, :4] = sq
    polys[0, 4:] = sq[-1]
    polys[1, :3] = tri
    polys[1, 3:] = tri[-1]
    pts = rng.uniform(0, 200, (3000, 2))
    ref = np.asarray(
        _points_in_polys(jnp.asarray(pts, jnp.float32),
                         jnp.asarray(polys, jnp.float32))
    )
    got = np.asarray(
        points_in_polys_pallas(
            jnp.asarray(pts, jnp.float32), jnp.asarray(polys, jnp.float32),
            interpret=True,  # CPU test mesh
        )
    )
    assert got.shape == ref.shape
    assert (got == ref).mean() > 0.999  # edge-grazing points may differ


@pytest.mark.skipif(not pallas_available(), reason="pallas unavailable")
def test_pallas_pip_known_points():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    polys = sq[None]
    pts = np.array([[5.0, 5.0], [15.0, 5.0], [-1.0, 3.0], [9.9, 9.9]])
    got = np.asarray(
        points_in_polys_pallas(
            jnp.asarray(pts, jnp.float32), jnp.asarray(polys, jnp.float32),
            interpret=True,
        )
    )[:, 0]
    assert got.tolist() == [True, False, False, True]
