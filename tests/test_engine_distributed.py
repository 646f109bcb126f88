"""Engine-integrated distribution: the FULL loop-closure pipeline running
with a device mesh (8 virtual CPU devices, conftest) must produce the same
trajectory as the single-device run.

This exercises the engine path end-to-end: SlamEngine builds the mesh,
loop-closure verification shards its candidate axis over it, and
PoseGraph2D.optimize routes through the distributed Schur-complement GN
(parallel/dist_pose_graph.py) instead of the single-device dense solve —
the scale path replacing /root/reference/utilities/pose_graph.py:83-134.
"""
import numpy as np
import pytest
import jax

from icp_tpu.engine import SlamEngine, filter_and_flatten
from icp_tpu.services.lidar import LidarService
from icp_tpu.services.imu import IMUService
from icp_tpu.utils.config import SlamConfig
from icp_tpu.utils.synth import generate_sequence

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def seq(tmp_path_factory):
    d = tmp_path_factory.mktemp("dist_seq")
    lidar = str(d / "lidar.csv")
    imu = str(d / "imu.csv")
    gt = generate_sequence(lidar, imu, n_scans=100, n_beams=720, noise=0.005,
                           trajectory="loop", seed=3)
    scans, rels = [], []
    for ts, rel, raw in LidarService(lidar).scans():
        scans.append(filter_and_flatten(raw, 0.5, 2.0))
        rels.append(rel)
    return scans, rels, imu, gt


def _cfg(distributed):
    return SlamConfig.from_dict({
        "imu": {"enabled": True, "narrow_search_range": 3.0},
        "icp": {"method": "point_to_line", "normal_k": 10, "voxel_size": 0.05,
                "error_threshold": 1e-9, "max_iterations": 60,
                "error_reject_threshold": 0.5},
        "features": {"method": "rotation_search", "rotation_voxel_size": 0.2,
                     "angle_step_coarse": 3.0, "angle_step_fine": 0.5},
        "submap": {"enabled": True, "size": 10, "voxel_size": 0.05,
                   "max_corr_dist": 1.0, "rotation_range": 10.0,
                   "rotation_step": 1.0, "rotation_fine_step": 0.25,
                   "rotation_voxel_size": 0.2},
        "loop_closure": {"enabled": True, "min_interval": 40,
                         "distance_threshold": 3.0,
                         "min_cumulative_travel": 4.0, "max_candidates": 3,
                         "error_threshold": 0.1,
                         "optimization_iterations": 20,
                         "information_scale": 5.0},
        "filter": {"z_min": 0.5, "z_max": 2.0},
        "mapping": {"resolution": 0.1, "margin": 20.0},
        "tpu": {"scan_capacity": 512, "submap_capacity": 4096,
                "max_ray_cells": 512, "batch_scans": 8,
                "distributed": distributed,
                # force the Schur path on these small test graphs
                "dist_node_threshold": 2},
    })


def _run(cfg, scans, rels, imu_file):
    eng = SlamEngine(cfg, imu=IMUService(imu_file), verbose=False)
    for p, r in zip(scans, rels):
        eng.process_scan(p, r)
    return eng


def test_lc_pipeline_distributed_matches_single_device(seq, monkeypatch):
    scans, rels, imu_file, gt = seq
    assert len(jax.devices()) >= 8, "conftest should expose 8 virtual devices"

    # spy: the distributed run must actually route optimize through the
    # sharded Schur solve, not silently fall back to dense
    import icp_tpu.parallel.dist_pose_graph as dpg
    calls = {"n": 0}
    real = dpg.optimize_schur

    def spy(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(dpg, "optimize_schur", spy)

    single = _run(_cfg(False), scans, rels, imu_file)
    assert single.mesh is None
    assert calls["n"] == 0
    assert single.stats.loop_closures >= 1

    dist = _run(_cfg(True), scans, rels, imu_file)
    assert dist.mesh is not None and dist.mesh.devices.size == 8
    assert dist.stats.loop_closures >= 1
    assert calls["n"] >= 1, "distributed run never hit the Schur solve"

    # Schur GN is exact, and LC verification is the same program over a
    # sharded batch axis — the arbitration sequence (accepts, rejections)
    # must match and the trajectories must agree to solver precision.
    assert dist.stats.loop_closures == single.stats.loop_closures
    assert dist.stats.scans == single.stats.scans
    a = np.stack([p[:2, 2] for p in single.pose_trajectory])
    b = np.stack([p[:2, 2] for p in dist.pose_trajectory])
    assert len(a) == len(b)
    ate = float(np.sqrt(np.mean(np.sum((a - b) ** 2, axis=1))))
    assert ate < 5e-3, f"distributed-vs-single trajectory ATE {ate:.4f} m"

    # the maps must agree too (same poses -> same paint)
    single.sync_map()
    dist.sync_map()
    pa = np.asarray(single.mapper.to_probability())
    pb = np.asarray(dist.mapper.to_probability())
    assert abs((pa > 0.6).sum() - (pb > 0.6).sum()) <= 0.02 * max(
        (pa > 0.6).sum(), 1)


def test_distributed_requires_multiple_devices(monkeypatch, seq):
    """tpu.distributed=true on a 1-device rig must fail loudly, not degrade."""
    dev0 = jax.devices()[0]
    monkeypatch.setattr(jax, "devices", lambda *a: [dev0])
    with pytest.raises(RuntimeError, match="distributed"):
        SlamEngine(_cfg(True), imu=None, verbose=False)
