from .assembly import ClassStiffness, assemble_stiffness, element_geometry
from .electrodes import boundary_loop, place_electrodes_equal_spacing
from .protocol import Protocol, abs_to_diff, create_protocol
from .solver import forward_solve, forward_solve_batched, forward_solve_cg
from .spectral import LowRankSpectralSolver, SpectralEITSolver
from .admittance import forward_solve_admittance, simulate_eit_spectroscopy
from .sheffield import (
    electrode_averaging_matrix,
    sheffield_ex_mat,
    sheffield_monitoring,
    sheffield_solve_admittance,
)
from .greit import GreitImager, greit_monitoring
from .inverse import DifferenceImager, gauss_newton_absolute, reconstruct_monitoring
from .forward import (
    compact_mesh_nodes,
    load_mesh_txt,
    prepare_mesh_info,
    simulate_eit_monitoring,
    write_dat,
)

__all__ = [
    "ClassStiffness",
    "assemble_stiffness",
    "element_geometry",
    "boundary_loop",
    "place_electrodes_equal_spacing",
    "Protocol",
    "abs_to_diff",
    "create_protocol",
    "forward_solve",
    "forward_solve_batched",
    "forward_solve_cg",
    "SpectralEITSolver",
    "LowRankSpectralSolver",
    "forward_solve_admittance",
    "simulate_eit_spectroscopy",
    "DifferenceImager",
    "GreitImager",
    "greit_monitoring",
    "gauss_newton_absolute",
    "reconstruct_monitoring",
    "electrode_averaging_matrix",
    "sheffield_ex_mat",
    "sheffield_monitoring",
    "sheffield_solve_admittance",
    "compact_mesh_nodes",
    "load_mesh_txt",
    "prepare_mesh_info",
    "simulate_eit_monitoring",
    "write_dat",
]
