"""Generate the committed mini rosbag fixture: a VLP-16 structor-style
recording (PointXYZIRT clouds + 100 Hz IMU orientation) of a simulated
yawing flight, with real motion skew inside each sweep — the input format
the reference's deployment consumes (lidar.h:15-32,
laserProcessingNode.cpp:201-204).

Usage: python scripts/make_bag_fixture.py [out.bag]
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from floam_tpu import sim  # noqa: E402
from floam_tpu.config import FloamConfig  # noqa: E402
from floam_tpu.io.rosbag import BagWriter  # noqa: E402

FRAMES = 6
AZ_STEPS = 360
YAW_RATE = 0.6  # rad/s — strong enough that rotational deskew matters
SPEED = 1.0  # m/s
IMU_HZ = 100.0


def main(out_path):
    cfg = FloamConfig.structor_vlp16()
    lid = cfg.lidar
    world = sim.World.room(size=16.0, height=4.0, num_poles=10, seed=3)
    period = lid.scan_period

    # trajectory with constant yaw rate + forward speed (world frame)
    def pose_at(t):
        yaw = YAW_RATE * t
        # integrate the turning motion exactly (circular arc)
        r = SPEED / YAW_RATE
        pos = np.array([r * np.sin(yaw), r * (1 - np.cos(yaw)), 1.5])
        q = np.array([np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)])
        return q, pos

    w = BagWriter(out_path, compression="bz2")

    def quat_mul(a, b):
        aw, ax, ay, az = a
        bw, bx, by, bz = b
        return np.array([aw * bw - ax * bx - ay * by - az * bz,
                         aw * bx + ax * bw + ay * bz - az * by,
                         aw * by - ax * bz + ay * bw + az * bx,
                         aw * bz + ax * by - ay * bx + az * bw])

    # the structor preset folds the reference's hardcoded lidar->IMU
    # extrinsic RPY(0,0,pi) into every IMU sample
    # (laserProcessingNode.cpp:196); a real recording's IMU reports the
    # IMU frame's attitude, i.e. q_imu = q_sensor * conj(q_extrinsic)
    q_ext_conj = np.array([np.cos(np.pi / 2), 0.0, 0.0, -np.sin(np.pi / 2)])

    # IMU stream covering the whole recording with margin
    t_imu = np.arange(-0.15, FRAMES * period + 0.15, 1.0 / IMU_HZ)
    for t in t_imu:
        q, _ = pose_at(t)
        w.write_imu("/nav/filtered_imu/data", 100.0 + t,
                    quat_mul(q, q_ext_conj),
                    angular_velocity=(0.0, 0.0, YAW_RATE))

    for i in range(FRAMES):
        t0 = i * period
        q, pos = pose_at(t0)
        yaw = YAW_RATE * t0
        vel = SPEED * np.array([np.cos(yaw), np.sin(yaw), 0.0])
        d = sim.simulate_scan_np(
            world, q, pos, lid, azimuth_steps=AZ_STEPS,
            elevation_limits=(-15.0, 15.0), noise=0.0, seed=i,
            motion_per_rev=(vel, np.array([0.0, 0.0, YAW_RATE])))
        m = d["mask"]
        ring = np.broadcast_to(
            np.arange(lid.num_lines, dtype=np.int32)[:, None], m.shape)
        w.write_cloud_xyzirt(
            "/velodyne_points", 100.0 + t0,
            d["xyz"][m].astype(np.float32), d["intensity"][m],
            ring[m], d["time"][m])
    w.close()
    print(f"wrote {out_path} "
          f"({Path(out_path).stat().st_size / 1024:.0f} KiB)")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else str(
        Path(__file__).parent.parent / "tests" / "data" /
        "structor_vlp16_mini.bag")
    main(out)
