"""Trajectory/map exporters — byte-compatible with the reference's interop
formats (they are the handoff surface to BALM / g2o / lio_sam back-ends):

  * g2o pose graph + per-keyframe dirs   -> SavePosegraph (src/utils.cpp:3-78)
  * per-scan <stamp>.pcd + .odom 4x4     -> SaveOdom (src/utils.cpp:81-106)
  * BALM alidarPose.csv + full<i>.pcd    -> SavePosesHomogeneousBALM
                                            (src/odomEstimationNode.cpp:97-121)
  * merged + downsampled map PCDs        -> SaveMerged
                                            (src/odomEstimationNode.cpp:66-96)
  * KITTI / TUM trajectory text formats  (new; required by the benchmark
                                          harness, absent in the reference)

Unlike the reference (exit-only dump of an unbounded in-RAM Dump struct,
odomEstimationNode.cpp:284-287), writers here can be called incrementally.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .pcd import write_pcd


def _quat_to_mat_np(q_wxyz: np.ndarray) -> np.ndarray:
    """Pure-NumPy wxyz quaternion -> rotation matrix (f64). Exporters call
    this per pose; a device dispatch here costs a host-device round trip
    per pose at export time."""
    w, x, y, z = np.asarray(q_wxyz, np.float64)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _pose_matrix(q_wxyz: np.ndarray, t: np.ndarray) -> np.ndarray:
    m = np.eye(4)
    m[:3, :3] = _quat_to_mat_np(q_wxyz)
    m[:3, 3] = t
    return m


def save_posegraph_graph(path, quats, trans, extra_edges=None,
                         info_diag=None) -> None:
    """Write ONLY the graph.g2o file (VERTEX_SE3:QUAT / FIX 0 / chained
    EDGE_SE3:QUAT) to ``path``. ``extra_edges``: optional non-consecutive
    constraints — e.g. the loop closures posegraph.py measures — as
    (i, j, dq_wxyz (4,), dt (3,)) with Z = T_i^-1 * T_j, written as
    additional EDGE_SE3:QUAT lines (the form lio_sam's back-end adds;
    rviz/slam.rviz displays them as loop constraints).

    ``info_diag``: 6 information-diagonal values in file order (x y z qx
    qy qz). Default reproduces the reference byte-for-byte — which writes
    its VARIANCES (0.01 trans / 0.001 rot) into the information slot
    (utils.cpp:46-55), i.e. semantically inverted; pass e.g.
    [100]*3 + [1000]*3 for a properly-weighted graph."""
    mats = [_pose_matrix(q, t) for q, t in zip(quats, trans)]
    lines = []
    for i, (q, t) in enumerate(zip(quats, trans)):
        # file order: x y z qx qy qz qw
        lines.append(
            f"VERTEX_SE3:QUAT {i} {t[0]} {t[1]} {t[2]} "
            f"{q[1]} {q[2]} {q[3]} {q[0]}")
    lines.append("FIX 0")
    if len(mats) <= 1:
        import sys

        print("cannot save a pose graph with only 1 vertex", file=sys.stderr)
    info = np.diag(info_diag if info_diag is not None
                   else [0.01, 0.01, 0.01, 0.001, 0.001, 0.001])
    info_upper = " ".join(
        str(info[i, j]) for i in range(6) for j in range(i, 6))
    for i in range(len(mats) - 1):
        rel = np.linalg.inv(mats[i]) @ mats[i + 1]
        tt = rel[:3, 3]
        qq = _mat_to_quat_xyzw(rel[:3, :3])
        lines.append(
            f"EDGE_SE3:QUAT {i} {i + 1} {tt[0]} {tt[1]} {tt[2]} "
            f"{qq[0]} {qq[1]} {qq[2]} {qq[3]} {info_upper}")
    for e in (extra_edges or []):
        i, j, dq, dt = e
        dq = np.asarray(dq, np.float64)
        dt = np.asarray(dt, np.float64)
        lines.append(
            f"EDGE_SE3:QUAT {int(i)} {int(j)} {dt[0]} {dt[1]} {dt[2]} "
            f"{dq[1]} {dq[2]} {dq[3]} {dq[0]} {info_upper}")
    Path(path).write_text("\n".join(lines) + "\n")


def load_g2o(path):
    """Parse a VERTEX_SE3:QUAT / EDGE_SE3:QUAT text graph (the exporter's
    own format; file quat order x y z w -> returned wxyz). Returns
    (quats (K, 4) wxyz, trans (K, 3),
     edges [(i, j, dq_wxyz (4,), dt (3,), weight (6,))]) with weight the
    information diagonal re-ordered to the optimizer's residual order
    (rot, trans)."""
    verts = {}
    edges = []
    for line in Path(path).read_text().splitlines():
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "VERTEX_SE3:QUAT":
            idx = int(parts[1])
            x, y, z, qx, qy, qz, qw = (float(v) for v in parts[2:9])
            verts[idx] = (np.array([qw, qx, qy, qz]), np.array([x, y, z]))
        elif parts[0] == "EDGE_SE3:QUAT":
            i, j = int(parts[1]), int(parts[2])
            x, y, z, qx, qy, qz, qw = (float(v) for v in parts[3:10])
            info = [float(v) for v in parts[10:31]]
            # upper-triangle row-major 6x6; diagonal entries at positions
            # 0, 6, 11, 15, 18, 20 in (x y z qx qy qz) order
            diag_pos = (0, 6, 11, 15, 18, 20)
            diag = [info[p] if len(info) == 21 else 1.0 for p in diag_pos]
            w = np.array(diag[3:] + diag[:3])  # -> (rot, trans)
            edges.append((i, j, np.array([qw, qx, qy, qz]),
                          np.array([x, y, z]), w))
    K = max(verts) + 1 if verts else 0
    quats = np.stack([verts[i][0] for i in range(K)])
    trans = np.stack([verts[i][1] for i in range(K)])
    return quats, trans, edges


def save_posegraph(directory, quats, trans, stamps,
                   clouds: Optional[Sequence[np.ndarray]] = None,
                   extra_edges=None) -> None:
    """g2o text format exactly as the reference writes it: VERTEX_SE3:QUAT
    lines (x y z qx qy qz qw), FIX 0, chained EDGE_SE3:QUAT with the upper
    triangle of a fixed diagonal information matrix
    (variances 0.01 trans / 0.001 rot; utils.cpp:46-55), plus any measured
    loop-closure edges (``extra_edges``; see save_posegraph_graph)."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    save_posegraph_graph(directory / "graph.g2o", quats, trans,
                         extra_edges=extra_edges)

    if clouds is not None:
        mats = [_pose_matrix(q, t) for q, t in zip(quats, trans)]
        for i, cloud in enumerate(clouds):
            kf_dir = directory / f"{i:06d}"
            kf_dir.mkdir(parents=True, exist_ok=True)
            write_pcd(kf_dir / "cloud.pcd", cloud[:, :3],
                      cloud[:, 3] if cloud.shape[1] > 3 else None)
            sec = int(stamps[i])
            nsec = int(round((stamps[i] - sec) * 1e9))
            with open(kf_dir / "data", "w") as f:
                f.write(f"stamp {sec} {nsec}\n")
                f.write("estimate\n")
                _write_matrix(f, mats[i])
                f.write("odom\n")
                _write_matrix(f, mats[i])
                f.write("accum_distance -1\n")
                f.write(f"id {i}\n")


def _write_matrix(f, m: np.ndarray) -> None:
    for row in m:
        f.write(" ".join(f"{v:.9g}" for v in row) + "\n")


def _mat_to_quat_xyzw(R: np.ndarray) -> np.ndarray:
    """Pure-NumPy rotation matrix -> xyzw quaternion (Shepperd's method:
    branch on the largest of trace/diagonal for stability)."""
    R = np.asarray(R, np.float64)
    tr = R[0, 0] + R[1, 1] + R[2, 2]
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] >= R[1, 1] and R[0, 0] >= R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] >= R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    return np.array([x, y, z, w])


def save_odom(directory, quats, trans, stamps,
              clouds: Sequence[np.ndarray]) -> None:
    """Per-scan <sec>_<nsec>.pcd + 4x4 .odom text (SaveOdom, utils.cpp:81-106)."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    for q, t, stamp, cloud in zip(quats, trans, stamps, clouds):
        sec = int(stamp)
        nsec = int(round((stamp - sec) * 1e9))
        base = directory / f"{sec:.6f}_{nsec:.6f}"
        write_pcd(str(base) + ".pcd", cloud[:, :3],
                  cloud[:, 3] if cloud.shape[1] > 3 else None)
        m = _pose_matrix(q, t)
        with open(str(base) + ".odom", "w") as f:
            for row in m:
                f.write(" ".join(str(v) for v in row) + "\n")


def save_balm(directory, quats, trans, stamps,
              clouds: Sequence[np.ndarray]) -> None:
    """BALM export: alidarPose.csv rows of the 4x4 pose with the stamp in
    the last slot, plus full<i>.pcd clouds
    (SavePosesHomogeneousBALM, odomEstimationNode.cpp:97-121)."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    with open(directory / "alidarPose.csv", "w") as f:
        for i, (q, t, stamp) in enumerate(zip(quats, trans, stamps)):
            m = _pose_matrix(q, t)
            f.write(f"{m[0,0]},{m[0,1]},{m[0,2]},{m[0,3]},\n")
            f.write(f"{m[1,0]},{m[1,1]},{m[1,2]},{m[1,3]},\n")
            f.write(f"{m[2,0]},{m[2,1]},{m[2,2]},{m[2,3]},\n")
            f.write(f"{m[3,0]},{m[3,1]},{m[3,2]},{stamp},\n")
    for i, cloud in enumerate(clouds):
        write_pcd(directory / f"full{i}.pcd", cloud[:, :3],
                  cloud[:, 3] if cloud.shape[1] > 3 else None)


def transform_clouds(clouds: Sequence[np.ndarray], quats, trans
                     ) -> List[np.ndarray]:
    """Sensor-frame clouds -> world frame by their per-scan poses.
    Pure NumPy: a device dispatch per cloud costs a round trip per frame."""
    out = []
    for cloud, q, t in zip(clouds, quats, trans):
        R = _quat_to_mat_np(q)
        w = (cloud[:, :3].astype(np.float64) @ R.T
             + np.asarray(t, np.float64)).astype(np.float32)
        if cloud.shape[1] > 3:
            w = np.concatenate([w, cloud[:, 3:]], axis=1)
        out.append(w)
    return out


def save_merged(directory, clouds, quats, trans,
                downsample_leaf: float = 0.3) -> None:
    """Merged full map + voxel-downsampled version from the per-scan
    SENSOR-frame XYZI clouds and their poses, with the reference's file
    names (SaveMerged, odomEstimationNode.cpp:66-96: floam_merged.pcd +
    floam_merged_downsampled_leaf_<size>.pcd).

    STREAMING: ``clouds`` may be any iterable (e.g. a disk-backed
    CloudSpool); each scan is transformed, appended to the merged PCD, and
    folded into the incremental voxel accumulator one at a time, so host
    RSS stays O(one scan + occupied voxels) regardless of run length —
    unlike the reference's all-in-RAM concatenate."""
    from ..ops.voxel import StreamingVoxelDownsample
    from .pcd import StreamingPcdWriter

    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    writer = None
    acc = StreamingVoxelDownsample(downsample_leaf)
    for cloud, q, t in zip(clouds, quats, trans):
        R = _quat_to_mat_np(q)
        w = (cloud[:, :3].astype(np.float64) @ R.T
             + np.asarray(t, np.float64)).astype(np.float32)
        if writer is None:
            writer = StreamingPcdWriter(directory / "floam_merged.pcd",
                                        has_intensity=cloud.shape[1] > 3)
        writer.append(w, cloud[:, 3] if cloud.shape[1] > 3 else None)
        acc.add(w)
    if writer is None:
        return
    writer.close()
    write_pcd(directory /
              f"floam_merged_downsampled_leaf_{downsample_leaf:.6f}.pcd",
              acc.centroids())


def save_kitti_trajectory(path, quats, trans) -> None:
    """KITTI odometry format: 12 numbers per line (3x4 row-major pose)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for q, t in zip(quats, trans):
            m = _pose_matrix(q, t)[:3].reshape(-1)
            f.write(" ".join(f"{v:.9e}" for v in m) + "\n")


def save_tum_trajectory(path, stamps, quats, trans) -> None:
    """TUM format: stamp tx ty tz qx qy qz qw."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for s, q, t in zip(stamps, quats, trans):
            f.write(f"{s:.9f} {t[0]:.9f} {t[1]:.9f} {t[2]:.9f} "
                    f"{q[1]:.9f} {q[2]:.9f} {q[3]:.9f} {q[0]:.9f}\n")


def load_kitti_trajectory(path) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (quats (N,4) wxyz, trans (N,3))."""
    import jax.numpy as jnp

    from ..ops import se3

    data = np.loadtxt(path).reshape(-1, 3, 4)
    R = data[:, :, :3]
    t = data[:, :, 3]
    q = np.asarray(se3.mat_to_quat(jnp.asarray(R)))
    return q, t


def save_frame_info(path, frames) -> None:
    """Per-frame structured record stream — the equivalent of the
    reference's lio_sam `cloud_info` bridge topic (PublishInfo,
    src/odomEstimationNode.cpp:125-166): per frame the registered pose as
    initial guess for a downstream pose-graph back-end plus factor-count
    diagnostics. JSONL; one object per frame. (The reference's message
    also carried the surf cloud duplicated into BOTH cloud fields —
    quirk 4; clouds here are exported separately via save_odom/save_balm.)
    """
    import json

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for fr in frames:
            q = np.asarray(fr.pose_q, np.float64)
            t = np.asarray(fr.pose_t, np.float64)
            # pure-NumPy quat->mat: a per-frame device dispatch here costs
            # a round trip per frame at export time
            w, x, y, z = q
            R = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x),
                 1 - 2 * (x * x + y * y)]])
            # ZYX euler (yaw-pitch-roll) initial-guess fields
            yaw = float(np.arctan2(R[1, 0], R[0, 0]))
            pitch = float(np.arcsin(np.clip(-R[2, 0], -1, 1)))
            roll = float(np.arctan2(R[2, 1], R[2, 2]))
            f.write(json.dumps({
                "stamp": fr.stamp,
                "initial_guess_x": float(t[0]),
                "initial_guess_y": float(t[1]),
                "initial_guess_z": float(t[2]),
                "initial_guess_roll": roll,
                "initial_guess_pitch": pitch,
                "initial_guess_yaw": yaw,
                "quat_wxyz": q.tolist(),
                "is_keyframe": bool(fr.is_keyframe),
                "num_edge_factors": fr.num_edge_factors,
                "num_surf_factors": fr.num_surf_factors,
                "dropped_points": list(getattr(fr, "dropped_points",
                                               (0, 0, 0))),
            }) + "\n")
