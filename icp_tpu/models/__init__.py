from icp_tpu.models.icp import icp, icp_core, identity_init, ICPResult  # noqa: F401
from icp_tpu.models.prealign import rotation_search, submap_rotation_search  # noqa: F401
from icp_tpu.models.features import (         # noqa: F401
    extract_keypoints, compute_descriptors, match_descriptors,
    feature_based_alignment,
)
from icp_tpu.models.occupancy import OccupancyGrid2D  # noqa: F401
from icp_tpu.models.pose_graph import PoseGraph2D, optimize_dense  # noqa: F401
from icp_tpu.models.slam_step import (        # noqa: F401
    make_slam_step, init_state, SlamState, StepOut,
)
