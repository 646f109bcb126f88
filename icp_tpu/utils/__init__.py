from icp_tpu.utils import se2  # noqa: F401
from icp_tpu.utils.config import SlamConfig, load_config  # noqa: F401
from icp_tpu.utils.masking import pad_points, bucket_capacity  # noqa: F401
