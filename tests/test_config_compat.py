"""Reference config.yaml compatibility + alignment-method matrix."""
import os

import numpy as np
import pytest

from icp_tpu.utils.config import SlamConfig, load_config

REF_CFG = "/root/reference/config.yaml"


@pytest.mark.skipif(not os.path.exists(REF_CFG),
                    reason="reference config not mounted")
def test_reference_config_loads_unmodified():
    cfg = SlamConfig.from_dict(load_config(REF_CFG))
    # spot-check tuned values from the reference file (config.yaml:19-76)
    assert cfg.icp_method == "point_to_line"
    assert cfg.icp_normal_k == 12
    assert cfg.icp_voxel == 0.04
    assert cfg.error_reject_threshold == 0.15
    assert cfg.alignment_method == "rotation_search"
    assert cfg.angle_step_coarse == 1.5
    assert cfg.submap_enabled and cfg.submap_size == 40
    assert cfg.sub_corr_dist == 1.5
    assert cfg.lc_enabled and cfg.lc_min_interval == 80
    assert cfg.lc_info_scale == 5.0
    assert cfg.z_min == 1.0 and cfg.z_max == 1.4
    assert cfg.map_resolution == 0.05 and cfg.p_hit == 0.85
    assert cfg.imu_enabled and cfg.imu_narrow == 3.0


def test_code_defaults_match_reference_code_defaults():
    """Empty config -> the reference's code-side defaults (slam.py:283-346),
    which differ from config.yaml values (SURVEY.md §5 knob census)."""
    cfg = SlamConfig.from_dict({})
    assert cfg.submap_size == 30          # slam.py:296 (yaml says 40)
    assert cfg.lc_min_travel == 20.0      # slam.py:338 (yaml says 6.0)
    assert cfg.icp_voxel == 0.06          # slam.py:94 default
    assert cfg.error_reject_threshold == 0.5
    assert not cfg.lc_enabled             # slam.py:331 default False
    assert cfg.lc_error_threshold == 0.03


def test_features_and_both_alignment_modes_run(tmp_path):
    """The modular engine path with features / both pre-alignment."""
    from icp_tpu.utils.synth import generate_sequence
    from icp_tpu.engine import run_slam

    lidar = str(tmp_path / "l.csv")
    imu = str(tmp_path / "i.csv")
    generate_sequence(lidar, imu, n_scans=8, n_beams=360, noise=0.005,
                      trajectory="straight", seed=5)
    for method in ("features", "both", "none"):
        cfg = {
            "data_file": lidar,
            "imu": {"enabled": False},
            "icp": {"method": "point_to_point", "voxel_size": 0.08,
                    "max_iterations": 30, "error_threshold": 1e-8,
                    "error_reject_threshold": 5.0},
            "features": {"method": method, "voxel_size": 0.15,
                         "ransac_iterations": 128, "top_n": 64,
                         "rotation_voxel_size": 0.25,
                         "angle_step_coarse": 6.0, "angle_step_fine": 1.0},
            "submap": {"enabled": False},
            "loop_closure": {"enabled": False},
            "filter": {"z_min": 0.5, "z_max": 2.0},
            "mapping": {"resolution": 0.2, "margin": 10.0},
            # reference default is service.loop=True (slam.py:315) — must
            # disable or the stream repeats forever
            "service": {"loop": False},
            "tpu": {"scan_capacity": 512, "max_ray_cells": 128,
                    "fused": method == "none"},
        }
        gp, traj, mapper, eng = run_slam(cfg, verbose=False)
        assert eng.stats.scans >= 6, method
        # straight 16m track over 8 scans: x must advance
        assert gp[0, 2] > 2.0, (method, gp[:2, 2])
