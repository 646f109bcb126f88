"""3D ICP correctness demo — the TPU equivalent of the reference's
teapot demo (/root/reference/demos/teapot_icp_demo.py): apply a KNOWN
25-degree Y-rotation + translation to a 3D cloud, run point-to-point ICP,
and report mean/max nearest-neighbor residuals. Renders a before/after
overlay PNG instead of an interactive window.

Uses the reference's bundled teapot.csv when available, otherwise a
generated 3D test cloud of the same size (418 points).
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp                                     # noqa: E402
from icp_tpu.models.icp import icp                          # noqa: E402
from icp_tpu.ops.nn import nn_query                         # noqa: E402
from icp_tpu.utils.masking import pad_points                # noqa: E402
from icp_tpu.utils.raster import Canvas                     # noqa: E402

TEAPOT = "/root/reference/teapot.csv"


def load_teapot():
    if os.path.exists(TEAPOT):
        with open(TEAPOT) as f:
            vals = np.fromstring(f.read().replace(",", " ").replace("\n", " "),
                                 sep=" ")
        return vals.reshape(-1, 3).astype(np.float32)
    rng = np.random.default_rng(7)
    # teapot-ish test body: ellipsoid shell + spout line
    u = rng.uniform(0, 2 * np.pi, 380)
    v = rng.uniform(0, np.pi, 380)
    body = np.stack([0.1 * np.cos(u) * np.sin(v),
                     0.07 * np.sin(u) * np.sin(v),
                     0.06 * np.cos(v)], 1)
    t = np.linspace(0, 1, 38)
    spout = np.stack([0.1 + 0.08 * t, np.zeros_like(t), 0.02 + 0.05 * t], 1)
    return np.concatenate([body, spout]).astype(np.float32)


def main():
    original = load_teapot()
    n = len(original)
    print(f"teapot: {n} points")

    # known transform (reference demo lines 38-47): 25 deg about Y + shift
    th = np.deg2rad(25.0)
    R_true = np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]],
        np.float32)
    t_true = np.array([0.05, 0.03, -0.02], np.float32)
    transformed = original @ R_true.T + t_true

    cap = 512
    sp, sm = pad_points(transformed, cap)
    tp, tm = pad_points(original, cap)
    res = icp(
        jnp.asarray(sp), jnp.asarray(sm), jnp.asarray(tp), jnp.asarray(tm),
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        voxel_size=0.005, method="point_to_point",
        max_iterations=300, error_threshold=1e-12,
    )
    R, t = np.asarray(res.R), np.asarray(res.t)
    aligned = transformed @ R.T + t

    ap, am = pad_points(aligned.astype(np.float32), cap)
    d, _ = nn_query(jnp.asarray(ap), jnp.asarray(tp), jnp.asarray(tm),
                    jnp.asarray(am))
    d = np.asarray(d)[:n]
    print(f"ICP iters={int(res.iters)} error={float(res.error):.3e}")
    print(f"residual mean={d.mean():.6f} max={d.max():.6f}")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "teapot_alignment.png")
    pts2 = np.concatenate([original[:, [0, 2]], transformed[:, [0, 2]],
                           aligned[:, [0, 2]]])
    Canvas.for_points(pts2, width=900).scatter(
        original[:, [0, 2]], "green", 3).scatter(
        transformed[:, [0, 2]], "red", 2).scatter(
        aligned[:, [0, 2]], "cyan", 2).save(out)
    print(f"wrote {out} (green=target, red=misaligned, cyan=after ICP)")

    ok = d.mean() < 0.01
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
