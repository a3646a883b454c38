"""Synthetic spinning-LiDAR simulator (host-side NumPy).

The reference has no tests and was validated by replaying rosbags visually
in rviz (SURVEY.md section 4). This simulator replaces that: it ray-casts a
parametric world (bounded planes + vertical cylinders — i.e. walls/floors
that become planar features and poles/corners that become edge features)
from a moving sensor, producing ring-structured scans with per-point times,
so odometry accuracy is measurable against exact ground truth.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from .config import LidarConfig
from .types import RingScan


@dataclasses.dataclass(frozen=True)
class Plane:
    """Bounded plane n.x + c = 0, kept where |proj - center| <= half_extent."""

    normal: np.ndarray  # (3,)
    c: float
    center: np.ndarray  # (3,)
    half_extent: float


@dataclasses.dataclass(frozen=True)
class Cylinder:
    """Vertical cylinder (pole) at (cx, cy), radius r, z in [z0, z1]."""

    cx: float
    cy: float
    r: float
    z0: float
    z1: float


@dataclasses.dataclass(frozen=True)
class World:
    planes: List[Plane]
    cylinders: List[Cylinder]

    @staticmethod
    def room(size=20.0, height=4.0, num_poles=12, seed=0) -> "World":
        """A rectangular room with floor/ceiling/walls and random poles."""
        rng = np.random.default_rng(seed)
        s, h = size / 2.0, height
        planes = [
            Plane(np.array([0.0, 0, 1]), 0.0, np.array([0.0, 0, 0]), s * 2),
            Plane(np.array([0.0, 0, 1]), -h, np.array([0.0, 0, h]), s * 2),
            Plane(np.array([1.0, 0, 0]), s, np.array([-s, 0, h / 2]), s * 2),
            Plane(np.array([1.0, 0, 0]), -s, np.array([s, 0, h / 2]), s * 2),
            Plane(np.array([0.0, 1, 0]), s, np.array([0, -s, h / 2]), s * 2),
            Plane(np.array([0.0, 1, 0]), -s, np.array([0, s, h / 2]), s * 2),
        ]
        cylinders = [
            Cylinder(float(rng.uniform(-s * 0.8, s * 0.8)),
                     float(rng.uniform(-s * 0.8, s * 0.8)),
                     float(rng.uniform(0.05, 0.15)), 0.0, h)
            for _ in range(num_poles)
        ]
        return World(planes=planes, cylinders=cylinders)


def raycast(world: World, origins: np.ndarray, dirs: np.ndarray,
            max_range: float) -> np.ndarray:
    """Nearest-hit distances for rays (N,3),(N,3) -> t (N,), inf if no hit."""
    n = len(origins)
    best = np.full(n, np.inf)
    for pl in world.planes:
        denom = dirs @ pl.normal
        t = -(origins @ pl.normal + pl.c) / np.where(np.abs(denom) < 1e-12,
                                                     np.inf, denom)
        hit = origins + t[:, None] * dirs
        ok = (t > 1e-6) & (np.max(np.abs(hit - pl.center), axis=1)
                           <= pl.half_extent)
        best = np.where(ok & (t < best), t, best)
    for cyl in world.cylinders:
        ox = origins[:, 0] - cyl.cx
        oy = origins[:, 1] - cyl.cy
        dx, dy = dirs[:, 0], dirs[:, 1]
        a = dx * dx + dy * dy
        b = 2 * (ox * dx + oy * dy)
        c = ox * ox + oy * oy - cyl.r * cyl.r
        disc = b * b - 4 * a * c
        ok0 = (disc >= 0) & (a > 1e-12)
        sq = np.sqrt(np.maximum(disc, 0.0))
        t = (-b - sq) / np.where(ok0, 2 * a, np.inf)
        z = origins[:, 2] + t * dirs[:, 2]
        ok = ok0 & (t > 1e-6) & (z >= cyl.z0) & (z <= cyl.z1)
        best = np.where(ok & (t < best), t, best)
    return np.where(best <= max_range, best, np.inf)


def simulate_scan(
    world: World,
    pose_q: np.ndarray,  # (4,) wxyz sensor->world
    pose_t: np.ndarray,  # (3,)
    lidar: LidarConfig,
    azimuth_steps: int = 900,
    elevation_limits: Tuple[float, float] = (-15.0, 15.0),
    noise: float = 0.0,
    seed: int = 0,
    motion_per_rev: Optional[Tuple[np.ndarray, np.ndarray]] = None,
) -> RingScan:
    """Simulate one revolution from the given pose.

    Points are emitted in sensor frame, ring-major with azimuth order
    preserved (what RingExtractionVelodyne would produce). ``time`` is the
    per-point offset in [0, scan_period). ``motion_per_rev`` optionally
    applies continuous motion during the revolution (for deskew tests):
    (velocity (3,), angular_velocity (3,)) in world frame.
    """
    from .ops import se3 as se3_ops
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    R, C = lidar.num_lines, lidar.points_per_ring
    az = np.linspace(0.0, 2 * np.pi, azimuth_steps, endpoint=False)
    el = np.deg2rad(np.linspace(elevation_limits[0], elevation_limits[1],
                                R))
    azg, elg = np.meshgrid(az, el)  # (R, A)
    d_sensor = np.stack(
        [np.cos(elg) * np.cos(azg), np.cos(elg) * np.sin(azg),
         np.sin(elg)], axis=-1).reshape(-1, 3)  # (R*A, 3)
    times = np.broadcast_to(az / (2 * np.pi) * lidar.scan_period,
                            (R, azimuth_steps)).reshape(-1)

    # per-ray pose (continuous motion during the sweep)
    Rm = np.asarray(se3_ops.quat_to_mat(jnp.asarray(pose_q,
                                                    dtype=jnp.float64)))
    if motion_per_rev is not None:
        vel, omega = motion_per_rev
        d_world = np.empty_like(d_sensor)
        origins = np.empty_like(d_sensor)
        for i, t in enumerate(np.unique(times)):
            sel = times == t
            dq = np.asarray(se3_ops.so3_exp_quat(
                jnp.asarray(omega * t, dtype=jnp.float64)))
            Rt = np.asarray(se3_ops.quat_to_mat(
                se3_ops.quat_mul(jnp.asarray(dq),
                                 jnp.asarray(pose_q, dtype=jnp.float64))))
            d_world[sel] = d_sensor[sel] @ Rt.T
            origins[sel] = pose_t + vel * t
    else:
        d_world = d_sensor @ Rm.T
        origins = np.broadcast_to(pose_t, d_sensor.shape).copy()

    t_hit = raycast(world, origins, d_world, lidar.max_distance)
    rng_noise = rng.normal(0, noise, size=t_hit.shape) if noise > 0 else 0.0
    dist = t_hit + rng_noise

    # back to (possibly per-time) sensor frame: point = dist * ray_dir
    pts_sensor = d_sensor * dist[:, None]
    rad_xy = np.linalg.norm(pts_sensor[:, :2], axis=1)
    valid = np.isfinite(dist) & (rad_xy >= lidar.min_distance) & \
        (rad_xy <= lidar.max_distance)

    pts = pts_sensor.reshape(R, azimuth_steps, 3)
    val = valid.reshape(R, azimuth_steps)
    tm = times.reshape(R, azimuth_steps)

    xyz = np.zeros((R, C, 3), np.float64)
    mask = np.zeros((R, C), bool)
    tarr = np.zeros((R, C), np.float64)
    for r in range(R):
        idx = np.nonzero(val[r])[0][:C]
        n = len(idx)
        xyz[r, :n] = pts[r, idx]
        tarr[r, :n] = tm[r, idx]
        mask[r, :n] = True

    import jax.numpy as jnp  # noqa: F811

    return RingScan(xyz=jnp.asarray(xyz), intensity=jnp.zeros((R, C)),
                    time=jnp.asarray(tarr), mask=jnp.asarray(mask))


def spiral_trajectory(num_poses: int, step: float = 0.12,
                      yaw_rate: float = 0.02,
                      center_z: float = 1.5) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Ground-truth trajectory: forward motion with slow yaw."""
    poses = []
    yaw = 0.0
    pos = np.array([-5.0, -3.0, center_z])
    for _ in range(num_poses):
        q = np.array([np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)])
        poses.append((q.copy(), pos.copy()))
        pos = pos + step * np.array([np.cos(yaw), np.sin(yaw), 0.0])
        yaw += yaw_rate
    return poses
