from .assembly import ClassStiffness, assemble_stiffness, element_geometry
from .electrodes import boundary_loop, place_electrodes_equal_spacing
from .protocol import Protocol, create_protocol
from .solver import forward_solve, forward_solve_batched
from .forward import prepare_mesh_info, simulate_eit_monitoring, write_dat

__all__ = [
    "ClassStiffness",
    "assemble_stiffness",
    "element_geometry",
    "boundary_loop",
    "place_electrodes_equal_spacing",
    "Protocol",
    "create_protocol",
    "forward_solve",
    "forward_solve_batched",
    "prepare_mesh_info",
    "simulate_eit_monitoring",
    "write_dat",
]
