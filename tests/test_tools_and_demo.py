import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_cloud_csv(path, pts):
    with open(path, "w") as f:
        f.write(",".join(f"{v:.5f}" for v in np.asarray(pts).reshape(-1)))


def _write_lidar_csv(path, scans):
    with open(path, "w") as f:
        for k, pts in enumerate(scans):
            row = ";".join(f"{v:.4f}" for v in np.asarray(pts).reshape(-1))
            f.write(f"{1000+k};{row}\n")


def _run(args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, cwd=REPO, env=env, timeout=300)


def test_png_writer(tmp_path):
    from icp_tpu.utils.raster import write_png, Canvas
    img = np.zeros((10, 12, 3), np.uint8)
    img[2:5, 3:7] = [255, 0, 0]
    p = str(tmp_path / "t.png")
    write_png(p, img)
    data = open(p, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    c = Canvas(-1, 1, -1, 1, width=64)
    c.scatter(np.array([[0.0, 0.0]]), "red", 3)
    c.polyline(np.array([[-0.5, -0.5], [0.5, 0.5]]), "cyan")
    c.save(str(tmp_path / "c.png"))
    assert os.path.getsize(tmp_path / "c.png") > 100


def test_pcview_tool(tmp_path):
    rng = np.random.default_rng(0)
    f = str(tmp_path / "cloud.csv")
    _write_cloud_csv(f, rng.uniform(-1, 1, (50, 3)))
    out = str(tmp_path / "view.png")
    r = _run(["tools/pcview.py", f, "-o", out])
    assert r.returncode == 0, r.stderr[-500:]
    assert os.path.exists(out)


def test_pcplayer_tool(tmp_path):
    rng = np.random.default_rng(1)
    f = str(tmp_path / "scans.csv")
    scans = [np.column_stack([rng.uniform(-2, 2, (30, 2)),
                              np.full(30, 1.2)]) for _ in range(6)]
    _write_lidar_csv(f, scans)
    outdir = str(tmp_path / "frames")
    r = _run(["tools/pcplayer.py", f, "--frames", "-o", outdir,
              "--every", "2"])
    assert r.returncode == 0, r.stderr[-500:]
    assert os.path.exists(os.path.join(outdir, "overlay.png"))
    assert len([x for x in os.listdir(outdir) if x.startswith("scan_")]) >= 3


def test_pcplayer_gif_playback(tmp_path):
    """Animated playback path: headless -> GIF via the pillow writer."""
    rng = np.random.default_rng(3)
    f = str(tmp_path / "scans.csv")
    scans = [np.column_stack([rng.uniform(-2, 2, (30, 2)),
                              np.full(30, 1.2)]) for _ in range(5)]
    _write_lidar_csv(f, scans)
    gif = str(tmp_path / "play.gif")
    r = _run(["tools/pcplayer.py", f, "--gif", gif, "--fps", "5"])
    assert r.returncode == 0, r.stderr[-500:]
    assert os.path.exists(gif) and os.path.getsize(gif) > 500


def test_pcplayer_stream_loader(tmp_path):
    """Background-thread loader yields every scan, in order."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools.pcplayer import LidarFrameStream
    rng = np.random.default_rng(4)
    f = str(tmp_path / "scans.csv")
    scans = [np.column_stack([rng.uniform(-2, 2, (25, 2)),
                              np.full(25, 1.2)]) for _ in range(12)]
    _write_lidar_csv(f, scans)
    frames = LidarFrameStream(f, stride=1, prefetch=4).drain()
    assert [i for i, _ in frames] == list(range(12))
    assert all(fr.shape == (25, 2) for _, fr in frames)


def test_pcman_tool(tmp_path):
    rng = np.random.default_rng(2)
    f = str(tmp_path / "cloud.csv")
    _write_cloud_csv(f, rng.uniform(-1, 1, (40, 3)))
    out = str(tmp_path / "tr.csv")
    r = _run(["tools/pcman.py", f, "-o", out, "--yaw", "30", "--tx", "0.5",
              "--png", str(tmp_path / "ba.png")])
    assert r.returncode == 0, r.stderr[-500:]
    from tools.pcview import load_cloud
    orig = load_cloud(f)
    got = load_cloud(out)
    assert got.shape == orig.shape
    # transform preserved pairwise distances (rigid)
    d0 = np.linalg.norm(orig[0] - orig[1])
    d1 = np.linalg.norm(got[0] - got[1])
    assert abs(d0 - d1) < 1e-4


def test_teapot_demo_runs():
    r = _run(["demos/teapot_icp_demo.py"])
    assert r.returncode == 0, r.stdout[-800:] + r.stderr[-500:]
    assert "PASS" in r.stdout


def test_live_map_view_headless():
    """LiveMapView renders under the Agg backend (window plumbing without a
    display): image/trajectory/pose artists update and zoom keys rescale."""
    import matplotlib
    matplotlib.use("Agg", force=True)
    from icp_tpu.models.occupancy import OccupancyGrid2D
    from icp_tpu.utils.liveview import LiveMapView

    mapper = OccupancyGrid2D(-5, 5, -5, 5, 0.1)
    origin = np.zeros(2, np.float32)
    ang = np.linspace(0, 2 * np.pi, 90, endpoint=False)
    hits = np.stack([3 * np.cos(ang), 3 * np.sin(ang)], 1).astype(np.float32)
    mapper.update_scan(origin, hits)

    view = LiveMapView(mapper, window_width=400, window_height=300,
                       background="white", trajectory_color="red")
    traj = np.array([[0.0, 0.0], [0.5, 0.1], [1.0, 0.3]])
    view.update(traj)
    assert view.img.get_array().shape == (mapper.ny, mapper.nx)
    np.testing.assert_allclose(view.traj_line.get_xdata(), traj[:, 0])
    x0 = view.ax.get_xlim()

    class _Ev:
        key = "+"
    view._on_key(_Ev())
    x1 = view.ax.get_xlim()
    assert (x1[1] - x1[0]) < (x0[1] - x0[0])      # zoomed in
    view.close()


def test_engine_snapshot_fallback(tmp_path):
    """Headless live_map=true writes PNG snapshots via maybe_snapshot."""
    import matplotlib
    matplotlib.use("Agg", force=True)
    from icp_tpu.utils.config import SlamConfig
    from icp_tpu.engine import SlamEngine

    cfg = SlamConfig.from_dict({
        "icp": {"method": "point_to_point", "voxel_size": 0.1,
                "max_iterations": 20},
        "features": {"method": "none"},
        "submap": {"enabled": False},
        "loop_closure": {"enabled": False},
        "mapping": {"resolution": 0.1, "margin": 5.0},
        "display": {"live_map": True, "snapshot_every": 2,
                    "snapshot_dir": str(tmp_path / "live")},
        "tpu": {"scan_capacity": 256, "batch_scans": 1, "fused": False},
    })
    engine = SlamEngine(cfg, verbose=False)
    rng = np.random.default_rng(0)
    ang = np.linspace(0, 2 * np.pi, 180, endpoint=False)
    for k in range(4):
        pts = np.stack([4 * np.cos(ang), 4 * np.sin(ang)], 1)
        pts += rng.normal(scale=0.005, size=pts.shape)
        engine.process_scan(pts.astype(np.float32), rel_time_us=k * 1000)
        engine.maybe_snapshot()
    snaps = list((tmp_path / "live").glob("*.png"))
    assert snaps, "expected PNG snapshots in headless live_map mode"
