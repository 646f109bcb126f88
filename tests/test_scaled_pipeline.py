"""BASELINE config #5 pipeline (parallel/scaled.py) on the 8-device CPU
mesh: scan registration via icp_large, block-sharded map paint, distributed
Schur BA — all in one run, checked for mesh-size invariance (the sharded
programs are exact, so an 8-device run must match a 1-device run) and for
accuracy against the synthetic ground truth."""
import numpy as np
import pytest
import jax

from icp_tpu.parallel.mesh import make_mesh
from icp_tpu.parallel.scaled import ScaledPipeline
from icp_tpu.utils.synth import large_scan_stream, make_dense_world


N_SCANS = 40
N_POINTS = 1536


@pytest.fixture(scope="module")
def scans():
    rng = np.random.default_rng(0)
    world = make_dense_world(rng, n_points=120_000, extent=10.0, n_walls=60)
    out = list(large_scan_stream(N_SCANS, n_points=N_POINTS, extent=10.0,
                                 max_range=9.0, noise=0.01, seed=1,
                                 world_points=world))
    return [s for s, _ in out], np.stack([g for _, g in out])


def _make(n_dev):
    return ScaledPipeline(
        make_mesh(n_dev),
        scan_capacity=N_POINTS, extent=10.0, map_resolution=0.25,
        map_margin=4.0, max_range=9.0,
        icp_max_corr=1.5, icp_max_iterations=25,
        icp_grid_shape=(32, 32), icp_cell_cap=64, icp_qcells=1024,
        kf_capacity=1024, kf_voxel=0.2,
        lc_every=2, lc_min_interval=16, lc_distance=3.0,
        lc_min_travel=8.0, lc_error_threshold=0.08,
        dist_node_threshold=2,
    )


def _rel(traj_xy, gt):
    """Both trajectories expressed relative to their first pose."""
    x0, y0, th0 = gt[0]
    c, s = np.cos(-th0), np.sin(-th0)
    R = np.array([[c, -s], [s, c]])
    return (gt[:, :2] - [x0, y0]) @ R.T


def test_scaled_pipeline_end_to_end_8dev(scans, monkeypatch):
    pts, gt = scans
    assert len(jax.devices()) >= 8

    import icp_tpu.parallel.dist_pose_graph as dpg
    calls = {"n": 0}
    real = dpg.optimize_schur

    def spy(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(dpg, "optimize_schur", spy)

    pipe = _make(8)
    assert pipe.log_odds.sharding.is_fully_replicated is False
    for p in pts:
        pipe.step(p)
    assert pipe.stats.scans == N_SCANS
    assert pipe.stats.lc_checked >= 1, "loop gates never fired"

    err_before = pipe.pose_graph.total_error()
    pipe.optimize(n_iterations=15)
    assert calls["n"] >= 1, "BA did not route through the Schur solve"
    assert pipe.pose_graph.total_error() <= err_before + 1e-6

    est = np.stack([m[:2, 2] for m in pipe.trajectory])
    want = _rel(None, gt)
    n = min(len(est), len(want))
    ate = float(np.sqrt(np.mean(np.sum((est[:n] - want[:n]) ** 2, axis=1))))
    assert ate < 0.5, f"scaled pipeline ATE {ate:.3f} m"

    prob = pipe.map_probability()
    assert (prob > 0.6).sum() > 200
    assert (prob < 0.4).sum() > 2000

    # GN-step timer runs on the real graph
    dt = pipe.time_gn_step(reps=2)
    assert dt > 0


def test_scaled_pipeline_mesh_invariance(scans):
    """8-device and 1-device runs are the same exact programs — trajectory
    and map must agree to solver precision."""
    pts, gt = scans
    a = _make(8)
    b = _make(1)
    for p in pts[:12]:
        a.step(p)
        b.step(p)
    ta = np.stack([m[:2, 2] for m in a.trajectory])
    tb = np.stack([m[:2, 2] for m in b.trajectory])
    np.testing.assert_allclose(ta, tb, atol=1e-4)
    # block-sharded paint partitions the grid: gathered maps must be equal
    np.testing.assert_allclose(np.asarray(a.log_odds), np.asarray(b.log_odds),
                               atol=1e-4)
