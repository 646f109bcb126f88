"""Command-line entry: python -m icp_tpu.cli --config config.yaml

Mirrors the reference CLI (/root/reference/slam.py:660-683): loads a YAML
config (reference-schema compatible), runs SLAM, saves the occupancy grid.
Extra subcommands: ``synth`` generates a reference-format synthetic
sequence; ``bench`` is at the repo root (bench.py).
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="TPU-native 2D SLAM (ICP + submap + pose-graph + mapping)"
    )
    parser.add_argument("--config", type=str, default="configs/default.yaml",
                        help="YAML configuration file")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--synth", action="store_true",
                        help="generate a synthetic sequence at data_file/imu "
                             "paths from the config before running")
    parser.add_argument("--synth-scans", type=int, default=120)
    args = parser.parse_args(argv)

    from icp_tpu.utils.config import SlamConfig
    cfg = SlamConfig.from_yaml(args.config)

    if args.synth:
        from icp_tpu.utils.synth import generate_sequence
        os.makedirs(os.path.dirname(cfg.data_file) or ".", exist_ok=True)
        gt = generate_sequence(
            cfg.data_file,
            cfg.imu_file or (cfg.data_file + ".imu.csv"),
            n_scans=args.synth_scans,
        )
        np.save(cfg.data_file + ".gt.npy", gt)
        print(f"synthetic sequence written: {cfg.data_file} "
              f"({args.synth_scans} scans)")

    from icp_tpu.engine import run_slam
    global_pose, trajectory, mapper, engine = run_slam(
        cfg, verbose=not args.quiet
    )

    print("global_pose:\n", global_pose)
    s = engine.stats
    print(f"scans={s.scans} rejected={s.rejected} "
          f"submap_corr={s.submap_corrections} loop_closures={s.loop_closures} "
          f"icp_iters={s.icp_iters}")
    print(f"wall: registration={s.wall_registration:.2f}s "
          f"mapping={s.wall_mapping:.2f}s lc={s.wall_loop_closure:.2f}s")

    if mapper is not None:
        for path in (cfg.out_csv, cfg.out_npy):
            d = os.path.dirname(path)
            if d:
                os.makedirs(d, exist_ok=True)
        mapper.save_csv(cfg.out_csv)
        mapper.save_npy(cfg.out_npy)
        print(f"map saved: {cfg.out_csv}, {cfg.out_npy}")


if __name__ == "__main__":
    main()
