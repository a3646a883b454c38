"""Periodic checkpoint/resume of the odometry engine.

The reference has NO mid-run persistence: everything is dumped once at
shutdown from an unbounded in-RAM Dump struct (SURVEY.md section 5;
src/odomEstimationNode.cpp:284-287,373-387), so a crash loses the run.
Here the full engine state — pose pair, voxel hash maps, keyframe gate,
iteration budget, frame index — plus the trajectory so far is snapshotted
to a single .npz and restored exactly (the state is a flat pytree of
arrays, so the round trip is bit-exact).
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import List, Optional, Tuple

import jax
import numpy as np

from ..types import OdomState

#: checkpoint format version. Bump whenever the on-device state ENCODING
#: changes in a way plain shape checks cannot catch (e.g. the ownership-key
#: lattice constants in ops/voxelmap — keys planes from an older lattice
#: pass the shape check but silently fail ownership matches and duplicate
#: voxel centroids on re-observation).
CKPT_VERSION = 2


def _flatten_state(state: OdomState) -> dict:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}


def save_checkpoint(path, state: OdomState, stamps, quats, trans,
                    frame_idx: Optional[int] = None,
                    extra: Optional[dict] = None,
                    global_map=None, kf_flags=None, imu=None) -> None:
    """Snapshot the engine. Optional host-side state travels along:
    ``global_map`` (a mapping.GlobalMap — its C6 block store),
    ``kf_flags`` ((N,) bool per-frame keyframe gates, so a resumed run can
    still export keyframe-gated posegraphs), and ``imu`` (an
    ops.deskew.ImuStream buffer)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = _flatten_state(state)
    payload["ckpt_version"] = np.asarray(CKPT_VERSION, np.int64)
    payload["traj_stamps"] = np.asarray(stamps)
    payload["traj_quats"] = np.asarray(quats)
    payload["traj_trans"] = np.asarray(trans)
    if kf_flags is not None:
        payload["traj_kf"] = np.asarray(kf_flags, bool)
    if global_map is not None:
        for k, v in global_map.to_arrays().items():
            payload[f"gmap_{k}"] = v
    if imu is not None and imu.stamps:
        payload["imu_stamps"] = np.asarray(imu.stamps)
        payload["imu_quats"] = np.asarray(imu.quats)
    if extra:
        for k, v in extra.items():
            payload[f"extra_{k}"] = np.asarray(v)
    tmp = path.with_suffix(".tmp.npz")
    np.savez_compressed(tmp, **payload)
    tmp.replace(path)  # atomic publish


def load_checkpoint(path, template: OdomState, global_map=None, imu=None
                    ) -> Tuple[OdomState, np.ndarray, np.ndarray, np.ndarray]:
    """Restore (state, stamps, quats, trans). ``template`` provides the
    pytree structure (from odometry.init_state with the same config).
    Pass ``global_map`` / ``imu`` to restore their saved host state in
    place (no-ops when the checkpoint predates those fields)."""
    import jax.numpy as jnp

    data = np.load(Path(path))
    version = int(data["ckpt_version"]) if "ckpt_version" in data else 1
    if version != CKPT_VERSION:
        raise ValueError(
            f"checkpoint format version {version} != supported "
            f"{CKPT_VERSION} — re-run from scratch (the stored hash-map "
            "key encoding is incompatible)")
    leaves, treedef = jax.tree_util.tree_flatten(template)
    restored = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if arr.shape != leaf.shape:
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != {leaf.shape} — "
                "config mismatch")
        restored.append(jnp.asarray(arr, leaf.dtype))
    state = jax.tree_util.tree_unflatten(treedef, restored)
    if global_map is not None and "gmap_keys" in data:
        global_map.load_arrays(data["gmap_keys"], data["gmap_offsets"],
                               data["gmap_points"])
    if imu is not None and "imu_stamps" in data:
        imu.stamps = [float(s) for s in data["imu_stamps"]]
        imu.quats = list(np.asarray(data["imu_quats"], np.float64))
    return (state, data["traj_stamps"], data["traj_quats"],
            data["traj_trans"])


def load_kf_flags(path) -> Optional[np.ndarray]:
    """Per-frame keyframe flags saved alongside the trajectory (None for
    checkpoints written before the field existed)."""
    data = np.load(Path(path))
    return np.asarray(data["traj_kf"], bool) if "traj_kf" in data else None
