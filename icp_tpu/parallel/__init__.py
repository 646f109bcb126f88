from icp_tpu.parallel.mesh import (          # noqa: F401
    make_mesh, shard_leading, replicated, init_distributed,
)
from icp_tpu.parallel.sweep_shard import sweep_scores_sharded  # noqa: F401
from icp_tpu.parallel.dist_pose_graph import (  # noqa: F401
    gn_step_sharded, gn_step_cg_sharded,
)
from icp_tpu.parallel.sharded_grid import raytrace_update_sharded  # noqa: F401
