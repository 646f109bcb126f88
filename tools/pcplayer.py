"""Headless scan player — renders a lidar sequence to PNG frames.

Equivalent of the reference's interactive pcplayer
(/root/reference/meta-utils/pcplayer.py): streams a lidar CSV, applies
stride / voxel downsampling, and writes every Nth scan as a PNG frame plus
a final overlay image (this environment has no display).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icp_tpu.services.lidar import LidarService       # noqa: E402
from icp_tpu.utils.raster import Canvas               # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description="Render lidar scans to PNG frames")
    ap.add_argument("file", help="lidar CSV (ts;x;y;z;... rows)")
    ap.add_argument("-o", "--outdir", default="frames")
    ap.add_argument("--every", type=int, default=10, help="render every Nth scan")
    ap.add_argument("--stride", type=int, default=1, help="point stride")
    ap.add_argument("--max-scans", type=int, default=None)
    ap.add_argument("--width", type=int, default=800)
    args = ap.parse_args(argv)

    os.makedirs(args.outdir, exist_ok=True)
    frames = 0
    total = 0
    overlay_pts = []
    for i, (ts, rel, pts) in enumerate(LidarService(args.file).scans()):
        if args.max_scans is not None and i >= args.max_scans:
            break
        total += 1
        p = pts[:: max(args.stride, 1), :2]
        overlay_pts.append(p[:: 5])
        if i % max(args.every, 1) != 0:
            continue
        canvas = Canvas.for_points(p, width=args.width)
        canvas.scatter(p, color="lime", size=2)
        canvas.scatter(np.zeros((1, 2)), color="red", size=6)
        path = os.path.join(args.outdir, f"scan_{i:05d}.png")
        canvas.save(path)
        frames += 1

    if overlay_pts:
        allp = np.concatenate(overlay_pts)
        Canvas.for_points(allp, width=args.width).scatter(
            allp, color="cyan", size=1
        ).save(os.path.join(args.outdir, "overlay.png"))
    print(f"{total} scans, {frames} frames -> {args.outdir}/")


if __name__ == "__main__":
    main()
