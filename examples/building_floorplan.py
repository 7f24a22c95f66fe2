"""Mesh a building floorplan: outer wall + rooms as labelled regions."""

import numpy as np

from eitx.mesh import create_mesh


def rect(cid, x0, y0, x1, y1):
    pts = [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]
    return f"{cid} " + " ".join(f"{x} {y}" for x, y in pts)


def main():
    polygons = [
        rect(4, 0, 0, 400, 300),        # outer wall (class 4)
        rect(0, 20, 20, 180, 140),      # room A
        rect(1, 200, 20, 380, 140),     # room B
        rect(2, 20, 160, 180, 280),     # room C
        rect(3, 200, 160, 380, 280),    # room D
    ]
    img, mesh = create_mesh(["1", "1"], polygons, lc=10, skin_width=0)
    print(f"floorplan: {len(mesh['TRIANGLES'])} elements, "
          f"classes {sorted(set(mesh['CLASS']))}")
    from eitx.io.images import to_png_bytes

    with open("floorplan_mesh.png", "wb") as fh:
        fh.write(to_png_bytes(img))


if __name__ == "__main__":
    main()
