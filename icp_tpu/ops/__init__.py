from icp_tpu.ops.nn import (                  # noqa: F401
    pairwise_sqdist, nn_query, knn_query, nn_query_chunked,
)
from icp_tpu.ops.voxel import voxel_downsample, voxel_downsample_fixed  # noqa: F401
from icp_tpu.ops.eig2 import eigh2x2, estimate_normals, compute_curvature  # noqa: F401
from icp_tpu.ops.rigid import (               # noqa: F401
    p2p_solve_2d, p2p_solve_3d, p2l_solve_2d, solve3x3,
)
from icp_tpu.ops.sweep import sweep_scores    # noqa: F401
from icp_tpu.ops.ransac import ransac_align   # noqa: F401
from icp_tpu.ops.raytrace import bresenham_cells, raytrace_update  # noqa: F401
from icp_tpu.ops.densegrid import (           # noqa: F401
    build_dense_grid, dense_nn_query, grid_origin,
)
