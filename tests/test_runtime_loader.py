import numpy as np
import pytest

from icp_tpu.runtime.loader import get_lib, load_lidar_csv
from icp_tpu.services.lidar import parse_lidar_line, LidarService


def _write_sample(path):
    lines = [
        "1000;1.0;2.0;1.2;0;0;0;3.5;-1.0;1.1",
        "2000;0.5;0.5;1.3",
        "3000;-2.0;4.0;1.0;7.0;8.0;1.25",
    ]
    path.write_text("\n".join(lines) + "\n")


def test_native_lib_builds():
    assert get_lib() is not None, "g++ build of fastcsv failed"


def test_native_matches_python_parser(tmp_path):
    f = tmp_path / "sample.csv"
    _write_sample(f)
    native = load_lidar_csv(str(f))
    assert len(native) == 3
    with open(f) as fh:
        for (ts_n, pts_n), line in zip(native, fh):
            ts_p, pts_p = parse_lidar_line(line)
            assert ts_n == ts_p
            np.testing.assert_allclose(pts_n, pts_p, rtol=1e-6)
    # padding triple dropped from first scan
    assert native[0][1].shape == (2, 3)


def test_lidar_service_streams(tmp_path):
    f = tmp_path / "sample.csv"
    _write_sample(f)
    out = list(LidarService(str(f)).scans())
    assert len(out) == 3
    ts0, rel0, pts0 = out[0]
    assert ts0 == 1000 and rel0 == 0
    ts2, rel2, _ = out[2]
    assert rel2 == 2000


def test_native_large_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    f = tmp_path / "big.csv"
    with open(f, "w") as fh:
        for k in range(50):
            vals = rng.uniform(-10, 10, size=(100, 3))
            row = ";".join(f"{v:.5f}" for v in vals.reshape(-1))
            fh.write(f"{1000+k};{row}\n")
    data = load_lidar_csv(str(f))
    assert len(data) == 50
    assert all(p.shape == (100, 3) for _, p in data)
