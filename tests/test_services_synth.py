import numpy as np

from icp_tpu.services.imu import IMUService, quat_to_yaw_np
from icp_tpu.utils.synth import make_world, ray_cast, generate_sequence


def test_imu_service_lookup(tmp_path):
    # semicolon rows ts;qx;qy;qz;qw (reference imu_service.py:1-9)
    f = tmp_path / "imu.csv"
    rows = []
    for k, yaw in enumerate([0.0, 0.1, 0.25, 0.4]):
        ts = 1_000_000 + k * 1000
        rows.append(f"{ts};0.0;0.0;{np.sin(yaw/2):.6f};{np.cos(yaw/2):.6f}")
    f.write_text("\n".join(rows) + "\n")
    imu = IMUService(str(f))
    assert abs(imu.yaw_at(0) - 0.0) < 1e-6
    assert abs(imu.yaw_at(1000) - 0.1) < 1e-6
    # nearest-neighbor: 1400us is closer to 1000 than 2000
    assert abs(imu.yaw_at(1400) - 0.1) < 1e-6
    assert abs(imu.yaw_at(1600) - 0.25) < 1e-6
    # clamped beyond range
    assert abs(imu.yaw_at(99_000) - 0.4) < 1e-6
    # delta wraps
    d = imu.delta_yaw(0, 3000)
    assert abs(d - 0.4) < 1e-6


def test_quat_to_yaw_vectorized():
    yaws = np.array([-2.0, 0.0, 1.5])
    qz, qw = np.sin(yaws / 2), np.cos(yaws / 2)
    got = quat_to_yaw_np(np.zeros(3), np.zeros(3), qz, qw)
    np.testing.assert_allclose(got, yaws, atol=1e-9)


def test_ray_cast_hits_walls():
    segs = make_world(np.random.default_rng(0), "rooms")
    origin = np.array([0.0, 0.5])
    # +x ray from center must hit the outer wall at x=12
    d = ray_cast(origin, np.array([0.0]), segs)
    assert abs(d[0] - 12.0) < 0.5 or d[0] < 12.0  # may hit interior box first
    # all 360 rays from inside the room must hit something
    angles = np.linspace(-np.pi, np.pi, 360, endpoint=False)
    dists = ray_cast(origin, angles, segs)
    assert np.isfinite(dists).all()
    assert (dists > 0.5).all() and (dists < 30).all()


def test_generate_sequence_formats(tmp_path):
    lidar = str(tmp_path / "l.csv")
    imu = str(tmp_path / "i.csv")
    gt = generate_sequence(lidar, imu, n_scans=5, n_beams=90, seed=1)
    assert gt.shape == (5, 3)
    with open(lidar) as f:
        line = f.readline().strip()
    parts = line.split(";")
    assert (len(parts) - 1) % 3 == 0      # ts + xyz triples
    int(parts[0])                          # integer timestamp
    with open(imu) as f:
        iline = f.readline().strip()
    assert len(iline.split(";")) == 5      # ts;qx;qy;qz;qw
