"""Synthetic end-to-end SLAM demo: simulate a room flight, run the engine,
report accuracy + throughput, write exports. Works on CPU or TPU.

    python scripts/run_sim.py [num_frames] [output_dir]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent.parent / ".jax_cache"))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from floam_tpu import sim  # noqa: E402
from floam_tpu.config import (ExportConfig, FloamConfig, LidarConfig,  # noqa: E402
                              OdomConfig)
from floam_tpu.ops import se3  # noqa: E402
from floam_tpu.runner import SequenceRunner  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    out = sys.argv[2] if len(sys.argv) > 2 else "out/sim"
    cfg = FloamConfig(
        lidar=LidarConfig(num_lines=16, points_per_ring=1024,
                          min_distance=0.5, max_distance=30.0),
        odom=OdomConfig(map_resolution=0.2, scan_edge_capacity=1024, scan_surf_capacity=4096, map_edge_table=8192,
                        map_surf_table=32768, max_outer_iters=6),
        export=ExportConfig(save_merged=True, save_balm=True,
                            save_posegraph=True, save_odom=True),
    )
    world = sim.World.room(size=18.0, height=4.0, num_poles=14, seed=1)
    gt = sim.spiral_trajectory(n, step=0.12, yaw_rate=0.03)

    def gen():
        for i, (q, t) in enumerate(gt):
            yield i * 0.1, sim.simulate_scan(world, q, t, cfg.lidar,
                                             azimuth_steps=720, seed=i)

    q0i, t0i = se3.pose_inverse(jnp.asarray(gt[0][0]), jnp.asarray(gt[0][1]))
    rel = [se3.pose_compose(q0i, t0i, jnp.asarray(q), jnp.asarray(t))
           for q, t in gt]
    gt_q = np.stack([np.asarray(r[0]) for r in rel])
    gt_t = np.stack([np.asarray(r[1]) for r in rel])

    runner = SequenceRunner(cfg, with_global_map=True, output_dir=out)
    result = runner.run(gen(), gt=(gt_q, gt_t), progress_every=10)
    print(f"frames={len(result.stamps)} ate={result.ate:.4f} m "
          f"rate={result.scans_per_sec:.1f} scans/s -> exports in {out}")


if __name__ == "__main__":
    main()
