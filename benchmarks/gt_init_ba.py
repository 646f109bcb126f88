"""Information-floor check for the 50k-keyframe graph (VERDICT r4 #2).

Loads a pose graph dumped by bench_scaled.py (BENCH_SCALED_DUMP_GRAPH),
re-initializes every node at GROUND TRUTH (expressed in the first pose's
frame — the frame the pipeline estimates in), runs the SAME optimize the
pipeline's terminal BA runs, and reports the resulting ATE next to the
streamed-init ATE.

Interpretation: the GT-init solve converges to (a neighborhood of) the
graph's true optimum because it starts at the one point whose basin we
care about. If its ATE matches the streamed-init ATE, the streamed solve
reached the graph optimum and the residual error is the INFORMATION
FLOOR of the measurements (odometry + closure edges simply don't
constrain the trajectory any tighter). If GT-init lands materially
lower, the streamed solve has solver slack (coarse init / CG budget).

Reference anchor: /root/reference/utilities/pose_graph.py:83-134 (the
optimize whose scaled replacement is being audited).

Usage: python benchmarks/gt_init_ba.py graph.npz [n_iterations]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np


def load_graph(path):
    from icp_tpu.models.pose_graph import PoseGraph2D
    d = np.load(path)
    pg = PoseGraph2D()
    pg.robust_phi = float(d["robust_phi"])
    for v in d["nodes"]:
        pg.add_node(v)
    for i, j, z, om, rb in zip(d["ei"], d["ej"], d["z"], d["om"], d["rb"]):
        pg.add_edge(int(i), int(j), z, om, robust=bool(rb))
    return pg, d


def main():
    from icp_tpu.utils.metrics import ate as ate_fn, gt_relative

    path = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    pg, d = load_graph(path)
    gt = d["gt"]
    gt_rel = gt_relative(gt).astype(np.float32)
    n = pg.n_nodes
    print(f"{n} nodes, {pg.n_edges} edges; optimize {iters} iters",
          file=sys.stderr, flush=True)

    streamed = np.stack(d["nodes"])
    ate_streamed_init = ate_fn(streamed[:, :2], gt, gt_offset=0)

    # solve A: streamed init (what the pipeline's terminal BA does)
    chi2_before = pg.total_error()
    pg.optimize(n_iterations=iters, fix_node=0)
    est = np.stack(pg.nodes)
    ate_streamed = ate_fn(est[:, :2], gt, gt_offset=0)
    chi2_streamed = pg.total_error()

    # solve B: ground-truth init, same graph, same optimize
    pg2, _ = load_graph(path)
    for k in range(n):
        pg2._nodes[k] = gt_rel[k].copy()
    chi2_gt_init = pg2.total_error()
    pg2.optimize(n_iterations=iters, fix_node=0)
    est2 = np.stack(pg2.nodes)
    ate_gt = ate_fn(est2[:, :2], gt, gt_offset=0)
    chi2_gt = pg2.total_error()

    print(json.dumps({
        "metric": "gt_init_ba_ate_m",
        "n_nodes": n,
        "n_edges": pg.n_edges,
        "n_iterations": iters,
        "ate_stream_m": round(float(ate_streamed_init), 4),
        "ate_streamed_init_m": round(float(ate_streamed), 4),
        "ate_gt_init_m": round(float(ate_gt), 4),
        "chi2_streamed_pre": float(chi2_before),
        "chi2_streamed_post": float(chi2_streamed),
        "chi2_at_gt": float(chi2_gt_init),
        "chi2_gt_init_post": float(chi2_gt),
        "strategy_streamed": pg.last_strategy,
        "strategy_gt": pg2.last_strategy,
    }))


if __name__ == "__main__":
    main()
