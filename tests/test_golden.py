"""Golden-value regression tests.

The reference has no golden outputs (SURVEY section 4); these pin the
forward solver's numerics so refactors cannot silently drift. Constants
were computed with the float64 scipy oracle on the fixture mesh.
"""

import numpy as np
import jax.numpy as jnp

from eitx.fem import (
    ClassStiffness,
    create_protocol,
    forward_solve_batched,
    place_electrodes_equal_spacing,
)

from meshfix import disk_mesh_with_classes

GOLDEN_SIGMA = np.array([0.00589, 0.35, 0.1422, 0.0172, 0.435])
GOLDEN_ROW0 = np.array(
    [1.74108570, 0.21800537, 0.12479647, 0.07176237, 0.05320554, 0.05642834]
)
GOLDEN_ROW8 = np.array(
    [0.06542943, 0.05398853, 0.06150553, 0.09896351, 0.13203346, 0.22767047]
)
GOLDEN_SUM = 75.56783854
GOLDEN_ABSMAX = 1.89679907


def test_forward_solver_golden_values():
    nodes, tris, cls = disk_mesh_with_classes(48, 6)
    el = place_electrodes_equal_spacing(nodes, tris, 16, starting_angle=np.pi)
    p = create_protocol(16, 1, 1, "std")
    cs = ClassStiffness.build(nodes, tris, cls, n_classes=5, dtype=jnp.float32)
    v = np.asarray(
        forward_solve_batched(
            cs,
            jnp.asarray(GOLDEN_SIGMA[None], jnp.float32),
            jnp.asarray(el),
            jnp.asarray(p.ex_mat),
            jnp.asarray(p.meas_mat),
        )
    )[0]
    assert np.allclose(v[0][:6], GOLDEN_ROW0, rtol=2e-3, atol=2e-5)
    assert np.allclose(v[8][:6], GOLDEN_ROW8, rtol=2e-3, atol=2e-5)
    assert abs(v.sum() - GOLDEN_SUM) / GOLDEN_SUM < 2e-3
    assert abs(np.abs(v).max() - GOLDEN_ABSMAX) / GOLDEN_ABSMAX < 2e-3
