"""icp_tpu — TPU-native 2D LiDAR SLAM engine (JAX/XLA/Pallas/pjit).

Brand-new implementation with the capabilities of the reference pipeline
(DUBSON0/iterative-closest-point-avmi, mounted at /root/reference): ICP
registration (point-to-point / point-to-line), correlative rotation search,
feature/RANSAC pre-alignment, IMU yaw fusion, rolling-submap drift
correction, SE(2) pose-graph loop closure, and log-odds occupancy mapping —
re-designed TPU-first (masked fixed-capacity tensors, batched closed-form
solves, lax control flow, mesh sharding) rather than ported.

Layout:
  ops/       masked device kernels (NN, voxel, eig2x2, rigid solves, sweeps,
             raytrace, RANSAC) + Pallas variants
  models/    algorithm engines (ICP, pre-alignment, features, submap,
             occupancy grid, pose graph, loop closure)
  parallel/  mesh + sharded variants (distributed GN, sharded sweeps/grid)
  services/  lidar/IMU ingestion (CSV, reference-compatible formats)
  runtime/   native host runtime (C++ CSV parser via ctypes)
  utils/     SE(2) transforms, masking, config
"""
import os as _os

import jax as _jax

# Geometry workloads need true f32 matmuls: the default TPU policy (bf16
# passes on the MXU) costs ~1e-3 relative error, which is millimetres on
# metre-scale clouds and breaks rigid-solve orthogonality. Hot kernels that
# can tolerate less set their own precision explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")

# This container's sitecustomize force-registers the TPU plugin and ignores
# JAX_PLATFORMS from the environment; honor an explicit CPU request so
# tests/tools can opt out of the (single, possibly busy) TPU chip.
if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    _jax.config.update("jax_platforms", "cpu")

__version__ = "0.1.0"
