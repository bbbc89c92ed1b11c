"""opencv_dlco_tpu — a TPU-native framework for DLCO descriptor learning.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of the
cbalint13/opencv-dlco reference (Descriptor Learning Using Convex
Optimisation, Simonyan-Vedaldi-Zisserman): pooling-region selection via
L1-regularised hinge RDA and low-rank discriminative projection via
trace-norm RDA with PSD eigen-projection, trained on Brown-style patch
pair datasets and evaluated with FPR95/AUC — plus the batched matching /
geometry extensions that turn the learned descriptors into a SLAM/SfM
front-end.

Layout (see SURVEY.md for the reference blueprint):

- ``ops``      — jitted numerical kernels: patch transform, pooling-region
                 filter bank, pair/ring distances, blockwise hinge loss
                 (Pallas), ROC/FPR95/AUC, PSD projection.
- ``models``   — the two convex solvers (PR RDA, PJ RDA), model selection
                 and statistics.
- ``parallel`` — device mesh construction, sharding rules, sharded train
                 steps and the vmapped hyperparameter sweep engine.
- ``data``     — Brown patchdata ingestion, HDF5 artifact store
                 (reference-compatible schema), synthetic datasets.
- ``pipeline`` — the 11-stage workflow (convert → genpr → compdist →
                 prlearn → prstats → ... → export) with idempotent resume.
- ``utils``    — configs, structured logging, progress, timing.
"""

__version__ = "0.1.0"
