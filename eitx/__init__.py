"""eitx — TPU-native framework for synthetic EIT dataset generation from thoracic CT.

Rebuilds the capabilities of EITSynthAI (reference: kt_service/* pipeline) as a
JAX/XLA framework: batched preprocessing + segmentation kernels, vectorized mask
cleanup, unstructured meshing with device-side element classification, and a
batched finite-element forward EIT solver vmapped over breathing frames and
stimulation patterns.

Layer map (top to bottom):
  serve     — HTTP service exposing the five upload modes
  pipeline  — the five pipeline modes as composable programs
  models    — YOLOv11 detect/segment in JAX
  image     — jit-able CT preprocessing (HU, windowing, body mask, morphology)
  masks     — device mask cleanup kernels
  contours  — mask -> class-labelled polygon extraction
  mesh      — triangulation + element tissue classification + export formats
  fem       — batched EIT forward solver (P1 FEM, adjacent protocol)
  physio    — tissue material database, spirometry / breathing models
  io        — DICOM / NIfTI / image decode (host side)
  geometry  — polygon/contour numeric filters
  parallel  — device mesh + sharding helpers
  core      — config, errors, logging, timing
"""

__version__ = "0.1.0"
