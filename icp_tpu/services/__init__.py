from icp_tpu.services.lidar import LidarService, parse_lidar_line  # noqa: F401
from icp_tpu.services.imu import IMUService  # noqa: F401
