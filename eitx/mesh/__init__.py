from .triangulate import triangulate_polygon
from .classify import classify_triangles
from .export import export_mesh, write_mesh_txt
from .render import render_mesh
from .api import create_mesh, find_outer_contour, add_skin

__all__ = [
    "triangulate_polygon",
    "classify_triangles",
    "export_mesh",
    "write_mesh_txt",
    "render_mesh",
    "create_mesh",
    "find_outer_contour",
    "add_skin",
]
