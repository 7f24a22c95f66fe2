"""Harvest the reference's embedded patient-derived trial geometries.

The reference ships SIX full segmented-slice polygon datasets as its
mesh-trials fixtures (`mesh_service_trials.py:10-322`, `test_list1..6`)
— real patient-derived contour sets, of which eitx's quality protocol
had only ever used the first (the `femm_generator.py:748-829` copy that
became `tests/data/real_slice_polygons.txt`). This script lifts the
other five into `tests/data/geometries/trial{2..6}.txt` so the OOD eval
can score every available real-derived anatomy (round-4 verdict item 2).

Class-ID reconciliation (the reference's documented inconsistency — see
SURVEY.md §7.3 "Class-ID reconciliation" and docs/COMPONENTS.md): the
segmentation side uses 0=bone 1=muscles 2=lung 3=adipose, but femm_tools
uses {0:bone, 1:muscles, 2:fat, 3:lung}. Structural analysis of the
embedded lists (largest-polygon class, two-large-lung signature):

- test_list1: seg mapping (body ring = class 3 adipose, lungs = 2).
- test_list2..5: femm mapping — the 85k-px body polygon is class 2 and
  the two ~20k-px lungs are class 3. Harvesting SWAPS 2<->3 so every
  stored file uses the canonical seg mapping.
- test_list6: seg mapping plus a class-4 body/skin contour (the NIfTI
  dataset-builder format, `create_axial_dataset_from_nii.py:478-573`).
  Class 4 is kept as-is; the renderer paints it as the outermost body
  region.

Note: lists 2-5 are four processing variants of ONE anatomy (body areas
85488/85718/85535/85608 px, near-identical lungs; list 3 is the
integer-quantized variant) — the harvest yields 3 distinct anatomies
across 6 geometry files, and the eval reports them per-file so the
near-duplicate structure stays visible.

Usage (only meaningful where /root/reference exists):
    python -m eitx.scripts.harvest_trials
"""

from __future__ import annotations

import ast
import os

import numpy as np

_REF = "/root/reference/kt_service/ai_tools/mesh_tools/mesh_service_trials.py"
_OUT = os.path.join(
    os.path.dirname(__file__), "..", "..", "tests", "data", "geometries"
)
# femm_tools class ids -> canonical segmentation ids (2<->3 swap)
_FEMM_TO_SEG = {0: 0, 1: 1, 2: 3, 3: 2, 4: 4}
# test_list indices that use the femm mapping (2..5 — all four variants
# of the shared anatomy; 3 is the integer-quantized one and is femm-
# mapped like its siblings: its largest polygon is the 85k-px class-2
# body, impossible under the seg mapping where 2=lung)
_FEMM_MAPPED = {2, 3, 4, 5}


def _extract_lists(path: str = _REF):
    tree = ast.parse(open(path).read())
    lists = {}
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Assign)
            and isinstance(node.targets[0], ast.Name)
            and node.targets[0].id.startswith("test_list")
        ):
            lists[int(node.targets[0].id[len("test_list"):])] = [
                ast.literal_eval(e) for e in node.value.elts
            ]
    return lists


def main():
    lists = _extract_lists()
    os.makedirs(_OUT, exist_ok=True)
    for n in sorted(lists):
        if n == 1:
            continue  # already tests/data/real_slice_polygons.txt
        out = os.path.join(_OUT, f"trial{n}.txt")
        with open(out, "w") as fh:
            fh.write(
                "# Patient-derived segmented-slice polygons, harvested from\n"
                "# the reference's embedded mesh-trials fixtures:\n"
                f"# mesh_service_trials.py test_list{n} "
                "(/root/reference/kt_service/ai_tools/mesh_tools/"
                "mesh_service_trials.py:10-322).\n"
                "# Classes remapped to the canonical segmentation ids\n"
                "# 0=bone 1=muscles 2=lung 3=fat 4=body "
                f"({'femm-mapping source: 2<->3 swapped' if n in _FEMM_MAPPED else 'already seg-mapped'}).\n"
                "# One polygon per line: '<class> x1 y1 x2 y2 ...'.\n"
            )
            for s in lists[n]:
                parts = s.split()
                cid = int(float(parts[0]))
                xy = np.asarray(parts[1:], float)
                cid = _FEMM_TO_SEG[cid] if n in _FEMM_MAPPED else cid
                fh.write(
                    f"{cid} " + " ".join(f"{v:g}" for v in xy) + "\n"
                )
        print("wrote", out, len(lists[n]), "polygons")


if __name__ == "__main__":
    main()
