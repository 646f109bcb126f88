"""Loop-closure cooldown gate (loop_closure.cooldown).

The reference re-runs candidate search + verification on EVERY scan while
the robot lingers in a revisited area (/root/reference/slam.py:565-620);
each accepted re-closure repeats the closure measurement's bias, which
measurably drags the optimized trajectory (see BENCHMARKS.md). The
cooldown suppresses _lc_find for N keyframes after an accepted closure;
0 (default) keeps exact reference behavior.
"""
import numpy as np

from icp_tpu.engine import SlamEngine
from icp_tpu.utils.config import SlamConfig


def _engine(cooldown):
    cfg = SlamConfig.from_dict({
        "icp": {"voxel_size": 0.08},
        "submap": {"enabled": False},
        "loop_closure": {"enabled": True, "min_interval": 2,
                         "cooldown": cooldown},
        "filter": {"z_min": 0.0, "z_max": 3.0},
    })
    return SlamEngine(cfg, verbose=False)


def test_cooldown_suppresses_search_window():
    eng = _engine(cooldown=10)
    calls = []
    eng._find_loop_candidates = lambda cur_idx, cur_xy=None: (
        calls.append(cur_idx), [])[1]
    pts = np.zeros((32, 2), np.float32)

    eng._last_lc_accept = 100
    assert eng._lc_find(pts, 105) is None       # inside the window
    assert calls == []                          # search never even ran
    assert eng._lc_find(pts, 110) is None       # window expired ...
    assert calls == [110]                       # ... search ran again


def test_cooldown_zero_is_reference_behavior():
    eng = _engine(cooldown=0)
    calls = []
    eng._find_loop_candidates = lambda cur_idx, cur_xy=None: (
        calls.append(cur_idx), [])[1]
    pts = np.zeros((32, 2), np.float32)
    eng._last_lc_accept = 100
    eng._lc_find(pts, 101)                      # immediately re-searches
    assert calls == [101]


def test_cooldown_survives_checkpoint(tmp_path):
    """_last_lc_accept (and the explicit scan counters) round-trip through
    save/load_checkpoint, so a resume inside the cooldown window stays
    suppressed (ADVICE r2)."""
    eng = _engine(cooldown=10)
    eng.pose_graph.add_node(np.zeros(3, np.float32))
    eng._last_lc_accept = 7
    eng.stats.scans = 9
    eng.stats.rejected = 2
    ck = str(tmp_path / "ck.npz")
    eng.save_checkpoint(ck)

    eng2 = _engine(cooldown=10)
    eng2.load_checkpoint(ck)
    assert eng2._last_lc_accept == 7
    assert eng2.stats.scans == 9 and eng2.stats.rejected == 2
    calls = []
    eng2._find_loop_candidates = lambda cur_idx, cur_xy=None: (
        calls.append(cur_idx), [])[1]
    pts = np.zeros((32, 2), np.float32)
    assert eng2._lc_find(pts, 12) is None      # still inside the window
    assert calls == []
    assert eng2._lc_find(pts, 17) is None      # window expired
    assert calls == [17]


def test_accept_arms_the_cooldown():
    eng = _engine(cooldown=10)
    assert eng._last_lc_accept is None
    # _lc_apply records the accepting node; build a minimal 2-node graph
    eng.pose_graph.add_node(np.zeros(3, np.float32))
    eng.pose_graph.add_node(np.array([1.0, 0.0, 0.0], np.float32))
    eng.scan_history = []  # not used by _lc_apply beyond rewrite loop
    import icp_tpu.engine as E
    r = np.eye(2, dtype=np.float32)
    t = np.array([1.0, 0.0], np.float32)
    eng._lc_apply(1, 0, 1.0, r, t, 0.01)
    assert eng._last_lc_accept == 1
