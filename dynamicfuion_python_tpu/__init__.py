"""TPU-native dynamic non-rigid RGB-D fusion engine.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the NNRT-Fusion
reference (DynamicFusion-style dense non-rigid reconstruction): sparse voxel-block TSDF
with non-rigid integration, embedded deformation-graph warp fields (flat and
hierarchical), a twice-differentiable tiled rasterizer, a dense-depth Gauss-Newton /
Levenberg-Marquardt mesh-to-image fitter backed by a block-sparse arrowhead
(Schur-complement) Cholesky solver, and the neural tracking stack (PWC-Net flow,
MaskNet, differentiable GN).

Package layout:
  ops/       stateless compute kernels (JAX/XLA + Pallas): linalg, KNN, anchors,
             warping, TSDF, marching cubes, rasterization, jacobians
  models/    stateful framework objects: warp fields, voxel grids, fitters, nets
  parallel/  device meshes, shardings, collective Gauss-Newton reduction
  data/      frame sequences, datasets, camera IO
  utils/     config tree, tensor IO, telemetry
  apps/      fusion pipeline, train/generate/evaluate entry points
"""

__version__ = "0.1.0"
