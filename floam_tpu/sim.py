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
    """Bounded plane n.x + c = 0, kept where |proj - center| <= half_extent
    (scalar: cube bound; (3,) vector: per-axis bound — used for building
    walls/roofs, which are rectangles, not squares)."""

    normal: np.ndarray  # (3,)
    c: float
    center: np.ndarray  # (3,)
    half_extent: np.ndarray  # float or (3,)


@dataclasses.dataclass(frozen=True)
class Cylinder:
    """Vertical cylinder (pole) at (cx, cy), radius r, z in [z0, z1].

    ``vx``/``vy`` make it a MOVING object (m/s in world frame): its
    center translates continuously with absolute time — both within a
    sweep (per-column fire times) and across frames — modelling
    pedestrians/vehicles, the classic dynamic-object stressor real data
    has and a static simulator hides."""

    cx: float
    cy: float
    r: float
    z0: float
    z1: float
    vx: float = 0.0
    vy: float = 0.0


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

    @staticmethod
    def outdoor(extent: float = 200.0, num_buildings: int = 24,
                num_poles: int = 36, path_radius: float = 40.0,
                clearance: float = 8.0, seed: int = 0) -> "World":
        """Outdoor-scale scene: ground plane, building-like boxes (4 walls +
        roof each) scattered inside and outside a circular corridor of
        ``path_radius`` (kept clear for the trajectory), and pole rows along
        the corridor — the large-extent analogue of a KITTI street loop for
        long-horizon drift evaluation."""
        rng = np.random.default_rng(seed)
        half = extent / 2.0
        planes = [Plane(np.array([0.0, 0, 1]), 0.0, np.zeros(3), extent)]
        placed = 0
        attempts = 0
        while placed < num_buildings and attempts < num_buildings * 40:
            attempts += 1
            wx = float(rng.uniform(4.0, 14.0))   # half-widths
            wy = float(rng.uniform(4.0, 14.0))
            h = float(rng.uniform(6.0, 22.0))
            cx = float(rng.uniform(-half * 0.85, half * 0.85))
            cy = float(rng.uniform(-half * 0.85, half * 0.85))
            # keep the circular corridor clear: building corner closest to
            # the ring must stay `clearance` away from the path circle
            r_near = np.hypot(max(abs(cx) - wx, 0.0), max(abs(cy) - wy, 0.0))
            r_far = np.hypot(abs(cx) + wx, abs(cy) + wy)
            if r_near < path_radius + clearance and \
                    r_far > path_radius - clearance:
                continue
            planes.extend(_box_planes(cx, cy, wx, wy, h))
            placed += 1
        cylinders = []
        for i in range(num_poles):
            ang = 2 * np.pi * i / num_poles + rng.uniform(-0.05, 0.05)
            r = path_radius + rng.choice([-4.0, 4.0]) + rng.uniform(-1, 1)
            cylinders.append(Cylinder(
                float(r * np.cos(ang)), float(r * np.sin(ang)),
                float(rng.uniform(0.08, 0.25)), 0.0,
                float(rng.uniform(3.0, 7.0))))
        return World(planes=planes, cylinders=cylinders)


    @staticmethod
    def corridor(length: float = 60.0, width: float = 4.0,
                 height: float = 3.0, num_poles: int = 3,
                 seed: int = 0) -> "World":
        """A long straight corridor (x in [0, length]) with end walls and a
        few poles clustered near the START — the classic degenerate
        geometry for scan matching: away from the ends, the two side
        walls + floor + ceiling constrain only 3 of 6 DoF, so
        along-corridor translation drifts and only a REVISIT of the
        feature-rich start can correct it (the loop-closure test/bench
        scenario)."""
        rng = np.random.default_rng(seed)
        hw = width / 2.0
        planes = [
            Plane(np.array([0.0, 0, 1]), 0.0,
                  np.array([length / 2, 0.0, 0.0]),
                  np.array([length, hw, 0.01])),
            Plane(np.array([0.0, 0, 1]), -height,
                  np.array([length / 2, 0.0, height]),
                  np.array([length, hw, 0.01])),
            Plane(np.array([0.0, 1, 0]), hw,
                  np.array([length / 2, -hw, height / 2]),
                  np.array([length, 0.01, height])),
            Plane(np.array([0.0, 1, 0]), -hw,
                  np.array([length / 2, hw, height / 2]),
                  np.array([length, 0.01, height])),
            Plane(np.array([1.0, 0, 0]), 0.0,
                  np.array([0.0, 0.0, height / 2]),
                  np.array([0.01, hw, height])),
            Plane(np.array([1.0, 0, 0]), -length,
                  np.array([length, 0.0, height / 2]),
                  np.array([0.01, hw, height])),
        ]
        cylinders = []
        for k in range(num_poles):
            # poles cluster at BOTH ends (doorframe-like landmarks); the
            # middle stays degenerate, so along-corridor drift accumulates
            # there and only an end revisit can correct it
            x0 = 1.0 if k % 2 == 0 else length - 6.0
            cylinders.append(Cylinder(
                float(rng.uniform(x0, x0 + 5.0)),
                float(rng.uniform(-hw * 0.7, hw * 0.7)),
                float(rng.uniform(0.06, 0.12)), 0.0, height))
        return World(planes=planes, cylinders=cylinders)


def _box_planes(cx: float, cy: float, wx: float, wy: float,
                h: float) -> List[Plane]:
    """Axis-aligned building box: 4 rectangular walls + flat roof."""
    zc, hz = h / 2.0, h / 2.0
    return [
        Plane(np.array([1.0, 0, 0]), -(cx + wx),
              np.array([cx + wx, cy, zc]), np.array([0.01, wy, hz])),
        Plane(np.array([1.0, 0, 0]), -(cx - wx),
              np.array([cx - wx, cy, zc]), np.array([0.01, wy, hz])),
        Plane(np.array([0.0, 1, 0]), -(cy + wy),
              np.array([cx, cy + wy, zc]), np.array([wx, 0.01, hz])),
        Plane(np.array([0.0, 1, 0]), -(cy - wy),
              np.array([cx, cy - wy, zc]), np.array([wx, 0.01, hz])),
        Plane(np.array([0.0, 0, 1]), -h,
              np.array([cx, cy, h]), np.array([wx, wy, 0.01])),
    ]


def raycast(world: World, origins: np.ndarray, dirs: np.ndarray,
            max_range: float, ray_times: Optional[np.ndarray] = None,
            t_abs: float = 0.0) -> np.ndarray:
    """Nearest-hit distances for rays (N,3),(N,3) -> t (N,), inf if no hit.

    ``ray_times`` (N,) + ``t_abs``: per-ray absolute fire times — moving
    cylinders (vx/vy != 0) are evaluated at their time-translated
    positions, so dynamic objects smear within a sweep and displace
    across frames exactly as real ones do."""
    n = len(origins)
    best = np.full(n, np.inf)
    for pl in world.planes:
        denom = dirs @ pl.normal
        t = -(origins @ pl.normal + pl.c) / np.where(np.abs(denom) < 1e-12,
                                                     np.inf, denom)
        hit = origins + t[:, None] * dirs
        he = np.broadcast_to(np.asarray(pl.half_extent, np.float64), (3,))
        ok = (t > 1e-6) & np.all(np.abs(hit - pl.center) <= he, axis=1)
        best = np.where(ok & (t < best), t, best)
    for cyl in world.cylinders:
        if (cyl.vx or cyl.vy) and ray_times is not None:
            tt = t_abs + ray_times
            ox = origins[:, 0] - (cyl.cx + cyl.vx * tt)
            oy = origins[:, 1] - (cyl.cy + cyl.vy * tt)
        elif cyl.vx or cyl.vy:
            ox = origins[:, 0] - (cyl.cx + cyl.vx * t_abs)
            oy = origins[:, 1] - (cyl.cy + cyl.vy * t_abs)
        else:
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


def _quat_to_mat_np(q: np.ndarray) -> np.ndarray:
    w, x, y, z = (float(v) for v in q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], np.float64)


def simulate_scan_np(
    world: World,
    pose_q: np.ndarray,  # (4,) wxyz sensor->world
    pose_t: np.ndarray,  # (3,)
    lidar: LidarConfig,
    azimuth_steps: int = 900,
    elevation_limits: Tuple[float, float] = (-15.0, 15.0),
    noise: float = 0.0,
    seed: int = 0,
    motion_per_rev: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    t_abs: float = 0.0,
    dropout_ring_p: float = 0.0,
    dropout_point_p: float = 0.0,
    noise_range_coeff: float = 0.0,
    elev_miscal_deg: float = 0.0,
):
    """NumPy-only scan simulation (no JAX: picklable for worker-pool batch
    generation). Returns dict(xyz (R,C,3) f32, time (R,C) f32, mask (R,C)).

    Realism stressors (each defaults off; the robustness matrix sweeps
    them — closest available proxy for real-data effects in this
    environment):
      * ``t_abs`` — absolute frame time; moving cylinders (Cylinder.vx/vy)
        are ray-cast at their time-translated positions (dynamic objects,
        smeared within the sweep via per-column fire times);
      * ``dropout_ring_p`` — per-frame probability a whole ring yields no
        returns (laser dropout / blockage);
      * ``dropout_point_p`` — i.i.d. per-point return dropout;
      * ``noise_range_coeff`` — range-dependent noise: sigma_eff =
        noise * (1 + coeff * range) (real rangefinders degrade with
        distance);
      * ``elev_miscal_deg`` — per-ring elevation-angle miscalibration,
        FIXED across frames (systematic; drawn from a seed-independent
        rng so every frame sees the same miscalibrated sensor).
    """
    rng = np.random.default_rng(seed)
    R, C = lidar.num_lines, lidar.points_per_ring
    az = np.linspace(0.0, 2 * np.pi, azimuth_steps, endpoint=False)
    el = np.deg2rad(np.linspace(elevation_limits[0], elevation_limits[1],
                                R))
    if elev_miscal_deg:
        cal_rng = np.random.default_rng(0xCA1)  # fixed: systematic error
        el = el + np.deg2rad(cal_rng.normal(0.0, elev_miscal_deg, R))
    azg, elg = np.meshgrid(az, el)  # (R, A)
    d_sensor = np.stack(
        [np.cos(elg) * np.cos(azg), np.cos(elg) * np.sin(azg),
         np.sin(elg)], axis=-1).reshape(-1, 3)  # (R*A, 3)
    times = np.broadcast_to(az / (2 * np.pi) * lidar.scan_period,
                            (R, azimuth_steps)).reshape(-1)

    # per-ray pose (continuous motion during the sweep) — vectorized over
    # the azimuth columns (every ring shares a column's fire time); the
    # previous per-unique-time Python loop was O(A^2 R) and made skewed
    # 1800-step benchmark scans take minutes each
    Rm = _quat_to_mat_np(np.asarray(pose_q, np.float64))
    if motion_per_rev is not None:
        vel, omega = motion_per_rev
        tu = az / (2 * np.pi) * lidar.scan_period  # (A,) column fire times
        w = np.asarray(omega, np.float64)[None, :] * tu[:, None]  # (A, 3)
        th = np.linalg.norm(w, axis=1)
        ax = np.where(th[:, None] > 1e-12, w / np.maximum(th, 1e-30)[:, None],
                      0.0)
        half = 0.5 * th
        dq = np.concatenate([np.cos(half)[:, None],
                             np.sin(half)[:, None] * ax], axis=1)  # (A,4)
        bw, bx, by, bz = np.asarray(pose_q, np.float64)
        aw, axx, ay, az_ = dq.T
        q_t = np.stack([aw * bw - axx * bx - ay * by - az_ * bz,
                        aw * bx + axx * bw + ay * bz - az_ * by,
                        aw * by - axx * bz + ay * bw + az_ * bx,
                        aw * bz + axx * by - ay * bx + az_ * bw], axis=1)
        qw, qx, qy, qz = q_t.T
        R_t = np.empty((len(tu), 3, 3), np.float64)  # (A, 3, 3)
        R_t[:, 0, 0] = 1 - 2 * (qy * qy + qz * qz)
        R_t[:, 0, 1] = 2 * (qx * qy - qw * qz)
        R_t[:, 0, 2] = 2 * (qx * qz + qw * qy)
        R_t[:, 1, 0] = 2 * (qx * qy + qw * qz)
        R_t[:, 1, 1] = 1 - 2 * (qx * qx + qz * qz)
        R_t[:, 1, 2] = 2 * (qy * qz - qw * qx)
        R_t[:, 2, 0] = 2 * (qx * qz - qw * qy)
        R_t[:, 2, 1] = 2 * (qy * qz + qw * qx)
        R_t[:, 2, 2] = 1 - 2 * (qx * qx + qy * qy)
        d_sr = d_sensor.reshape(R, len(tu), 3)
        d_world = np.einsum("aij,raj->rai", R_t, d_sr).reshape(-1, 3)
        org = np.asarray(pose_t, np.float64)[None, :] \
            + np.asarray(vel, np.float64)[None, :] * tu[:, None]  # (A, 3)
        origins = np.broadcast_to(org[None], d_sr.shape).reshape(-1, 3)
    else:
        d_world = d_sensor @ Rm.T
        origins = np.broadcast_to(pose_t, d_sensor.shape).copy()

    t_hit = raycast(world, origins, d_world, lidar.max_distance,
                    ray_times=times, t_abs=t_abs)
    if noise > 0:
        sigma = noise * (1.0 + noise_range_coeff
                         * np.nan_to_num(t_hit, posinf=0.0))
        rng_noise = rng.normal(0, 1.0, size=t_hit.shape) * sigma
    else:
        rng_noise = 0.0
    with np.errstate(invalid="ignore"):
        dist = t_hit + rng_noise

        # back to (possibly per-time) sensor frame: point = dist * ray_dir
        pts_sensor = d_sensor * dist[:, None]
    rad_xy = np.linalg.norm(pts_sensor[:, :2], axis=1)
    valid = np.isfinite(dist) & (rad_xy >= lidar.min_distance) & \
        (rad_xy <= lidar.max_distance)
    if dropout_point_p > 0:
        valid &= rng.random(valid.shape) >= dropout_point_p
    if dropout_ring_p > 0:
        ring_alive = rng.random(R) >= dropout_ring_p
        valid &= np.repeat(ring_alive, azimuth_steps)

    pts = pts_sensor.reshape(R, azimuth_steps, 3)
    val = valid.reshape(R, azimuth_steps)
    tm = times.reshape(R, azimuth_steps)

    # synthetic per-point return intensity: range-attenuated with a bit of
    # deterministic texture, so the XYZI export path has a real channel to
    # carry (the reference's sensor provides it natively, lidar.h:15-32)
    inten_flat = (0.1 + 0.9 * np.exp(-np.nan_to_num(dist, nan=0.0) / 40.0)
                  * (0.75 + 0.25 * np.cos(3.0 * azg.reshape(-1))))
    intens = inten_flat.reshape(R, azimuth_steps)

    xyz = np.zeros((R, C, 3), np.float64)
    mask = np.zeros((R, C), bool)
    tarr = np.zeros((R, C), np.float64)
    iarr = np.zeros((R, C), np.float64)
    for r in range(R):
        idx = np.nonzero(val[r])[0][:C]
        n = len(idx)
        xyz[r, :n] = pts[r, idx]
        tarr[r, :n] = tm[r, idx]
        iarr[r, :n] = intens[r, idx]
        mask[r, :n] = True
    return dict(xyz=xyz, time=tarr, mask=mask, intensity=iarr)


def simulate_scan(world, pose_q, pose_t, lidar, azimuth_steps: int = 900,
                  elevation_limits: Tuple[float, float] = (-15.0, 15.0),
                  noise: float = 0.0, seed: int = 0,
                  motion_per_rev=None, **stressors) -> RingScan:
    """Simulate one revolution from the given pose.

    Points are emitted in sensor frame, ring-major with azimuth order
    preserved (what RingExtractionVelodyne would produce). ``time`` is the
    per-point offset in [0, scan_period). ``motion_per_rev`` optionally
    applies continuous motion during the revolution (for deskew tests):
    (velocity (3,), angular_velocity (3,)) in world frame.
    """
    import jax.numpy as jnp

    d = simulate_scan_np(world, pose_q, pose_t, lidar, azimuth_steps,
                         elevation_limits, noise, seed, motion_per_rev,
                         **stressors)
    return RingScan(xyz=jnp.asarray(d["xyz"]),
                    intensity=jnp.asarray(d["intensity"]),
                    time=jnp.asarray(d["time"]), mask=jnp.asarray(d["mask"]))


def _scan_job(args):
    world, q, t, lidar, azimuth_steps, noise, seed, extra = args
    d = simulate_scan_np(world, q, t, lidar, azimuth_steps=azimuth_steps,
                         noise=noise, seed=seed, **extra)
    return (d["xyz"].astype(np.float32), d["time"].astype(np.float32),
            d["mask"], d["intensity"].astype(np.float32))


def simulate_sequence(world: World, poses, lidar: LidarConfig,
                      azimuth_steps: int = 900, noise: float = 0.0,
                      workers: int = 0, **stressors):
    """Batch scan generation over a pose list, optionally on a process pool
    (the ray-cast is pure NumPy). Returns a list of (xyz f32, time f32,
    mask, intensity f32) numpy tuples in pose order. ``stressors`` are
    forwarded to simulate_scan_np (dropout/miscal/range-noise; ``t_abs``
    is set per frame from the scan period so moving objects advance)."""
    jobs = [(world, q, t, lidar, azimuth_steps, noise, i,
             dict(stressors, t_abs=i * lidar.scan_period))
            for i, (q, t) in enumerate(poses)]
    if workers and len(jobs) > 1:
        import multiprocessing as mp

        with mp.get_context("spawn").Pool(workers) as pool:
            return pool.map(_scan_job, jobs)
    return [_scan_job(j) for j in jobs]


def circuit_trajectory(num_poses: int, radius: float = 40.0,
                       step: float = 1.25, center_z: float = 1.8,
                       ramp_frames: int = 25,
                       ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Closed circular circuit (heading tangent to the circle): ``step``
    metres of arc per pose at cruise, so roughly num_poses * step /
    (2*pi*radius) loops — pass enough poses for > 1 loop to exercise map
    revisits. KITTI-like scale: step 1.25 m at 10 Hz = 12.5 m/s. Speed
    ramps linearly from rest over ``ramp_frames`` (KITTI sequences also
    start at rest; a cold constant-velocity predictor cannot latch onto a
    full-speed first step whose error exceeds the association radius)."""
    poses = []
    th = 0.0
    for i in range(num_poses):
        yaw = th + np.pi / 2.0
        q = np.array([np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)])
        t = np.array([radius * np.cos(th), radius * np.sin(th), center_z])
        poses.append((q, t))
        s = step * min(1.0, (i + 1) / max(ramp_frames, 1))
        th += s / radius
    return poses


def out_and_back_trajectory(length: float = 40.0, step: float = 0.8,
                            center_z: float = 1.5, start_x: float = 3.0,
                            turn_frames: int = 10, y: float = 0.0,
                            ramp_frames: int = 6,
                            ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Drive +x for ``length`` metres, U-turn over ``turn_frames`` on a
    tight arc, drive back to the start — the revisit trajectory for the
    corridor loop-closure scenario (accumulated along-corridor drift is
    corrected only when the feature-rich start is re-observed)."""
    poses: List[Tuple[np.ndarray, np.ndarray]] = []

    def pose(yaw, x, yy):
        q = np.array([np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)])
        return q, np.array([x, yy, center_z])

    x = start_x
    i = 0
    while x < start_x + length:
        poses.append(pose(0.0, x, y))
        i += 1
        x += step * min(1.0, i / max(ramp_frames, 1))
    r = 0.8  # U-turn arc radius (m)
    for k in range(1, turn_frames + 1):
        th = np.pi * k / turn_frames
        poses.append(pose(th, x + r * np.sin(th), y + r * (1 - np.cos(th))))
    xb = x
    while xb > start_x:
        xb -= step
        poses.append(pose(np.pi, xb, y + 2 * r))
    return poses


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
