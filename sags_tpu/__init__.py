"""sags_tpu — a TPU-native (JAX/XLA/Pallas/pjit) semantic Gaussian-splatting SLAM framework.

Built from scratch with the capabilities of dsowrd/Segment-Any-Gaussian-Splatting-SLAM:

- ``sags_tpu.ops.rasterize``: differentiable tiled Gaussian rasterizer (EWA projection,
  tile binning, depth-sorted alpha compositing of RGB + 16 semantic channels +
  covariance-conditioned depth) — the TPU-native equivalent of the reference's
  ``submodules/diff-gaussian-rasterization`` CUDA kernels.
- ``sags_tpu.ops.knn``: mean k-NN distance / k-NN queries (reference:
  ``submodules/simple-knn``).
- ``sags_tpu.ops.gicp``: GICP / VGICP scan registration with per-point covariance →
  (quaternion, scale) export (reference: ``submodules/fast_gicp`` + ``pygicp``).
- ``sags_tpu.mapping``: incremental Gaussian map with densify/prune and per-group
  optimization (reference: ``scene/gaussian_model.py``).
- ``sags_tpu.slam``: fused jitted SLAM step + online pipeline (reference:
  ``scripts/gaussian_splatting.py``).
- ``sags_tpu.semantics``: SAM-style mask provider, cross-frame instance association,
  semantic classifier head and losses.
"""

__version__ = "0.1.0"
