"""Sequence runner: the user-facing entry point tying everything together.

This is the equivalent of the reference's roslaunch orchestration
(launch/structor_odom.launch starting the three nodes, rviz and the
trajectory server) plus the odometry node's shutdown persistence
(src/odomEstimationNode.cpp:373-387): stream scans from a source (KITTI
directory, simulator, or iterator), run the jitted SLAM front-end,
optionally maintain the global map, periodically checkpoint, and export
trajectories/maps/posegraphs in the reference's interchange formats.
"""
from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Iterable, Iterator, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .config import FloamConfig
from .mapping import GlobalMap
from .pipeline import Pipeline
from .types import Pose, RingScan
from .utils.checkpoint import save_checkpoint
from .utils.profiling import RateMeter


def _watchdog_iter(source: Iterable, timeout_s: float) -> Iterator:
    """Producer-thread wrapper that ends the stream after ``timeout_s`` of
    silence from the source (the reference's keep_running watchdog)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=16)
    _END = object()

    def pump():
        try:
            for item in source:
                q.put(item)
        finally:
            q.put(_END)

    t = threading.Thread(target=pump, daemon=True)
    t.start()
    import queue as _qmod

    while True:
        try:
            item = q.get(timeout=timeout_s)
        except _qmod.Empty:
            print(f"[floam_tpu] no data for {timeout_s:.1f}s — "
                  "stopping and saving", flush=True)
            return
        if item is _END:
            return
        yield item


@dataclasses.dataclass
class RunResult:
    stamps: np.ndarray
    quats: np.ndarray  # (N, 4) wxyz
    trans: np.ndarray  # (N, 3)
    ate: Optional[float] = None
    drift_pct: Optional[float] = None
    scans_per_sec: float = 0.0


class SequenceRunner:
    def __init__(self, cfg: FloamConfig, dtype=jnp.float32,
                 with_global_map: bool = False,
                 output_dir: Optional[str] = None,
                 checkpoint_every: int = 0):
        self.cfg = cfg
        ec = cfg.export
        # cloud-bearing exports need the per-scan registered feature clouds
        # (the reference's Dump accumulation, odomEstimationNode.cpp:284-287)
        collect = bool(output_dir) and (ec.save_balm or ec.save_posegraph
                                        or ec.save_odom or ec.save_merged)
        self.pipe = Pipeline(cfg, dtype=dtype, collect_clouds=collect)
        self.global_map = GlobalMap(cfg.mapping) if with_global_map else None
        self.output_dir = Path(output_dir) if output_dir else None
        self.checkpoint_every = checkpoint_every
        self.meter = RateMeter()

    def run(self, scans: Iterable[Tuple[float, RingScan]],
            gt: Optional[Tuple[np.ndarray, np.ndarray]] = None,
            progress_every: int = 0,
            idle_timeout_s: Optional[float] = None) -> RunResult:
        """Consume the scan stream. ``idle_timeout_s`` arms the liveness
        watchdog of the reference's odometry node (3 s of data silence
        triggers a graceful stop-and-save, src/odomEstimationNode.cpp:
        170-174): when the source yields nothing for that long, the run
        ends and exports are still written."""
        if idle_timeout_s is not None:
            scans = _watchdog_iter(scans, idle_timeout_s)
        n = 0
        for stamp, scan in scans:
            with self.meter.frame():
                rec = self.pipe.process(scan, stamp)
                if self.global_map is not None and rec.is_keyframe:
                    xyz = np.asarray(scan.xyz).reshape(-1, 3)
                    mask = np.asarray(scan.mask).reshape(-1)
                    pose = Pose(q=jnp.asarray(rec.pose_q, jnp.float32),
                                t=jnp.asarray(rec.pose_t, jnp.float32))
                    self.global_map.update(jnp.asarray(xyz), pose,
                                           mask=jnp.asarray(mask))
            n += 1
            if progress_every and n % progress_every == 0:
                s = self.meter.summary()
                print(f"[floam_tpu] frame {n}: "
                      f"{s.get('scans_per_sec', 0):.1f} scans/s, "
                      f"p95 {s.get('p95_ms', 0):.1f} ms", flush=True)
            if (self.checkpoint_every and self.output_dir
                    and n % self.checkpoint_every == 0):
                st, qs, ts = self.pipe.trajectory()
                save_checkpoint(self.output_dir / "checkpoint.npz",
                                self.pipe.state, st, qs, ts)

        st, qs, ts = self.pipe.trajectory()
        result = RunResult(stamps=st, quats=qs, trans=ts,
                           scans_per_sec=self.meter.summary().get(
                               "scans_per_sec", 0.0))
        if gt is not None:
            from . import metrics

            gt_q, gt_t = gt
            m = min(len(gt_t), len(ts))
            result.ate, _ = metrics.ate(ts[:m], gt_t[:m])
            drift, _ = metrics.kitti_drift(qs[:m], ts[:m], gt_q[:m],
                                           gt_t[:m])
            result.drift_pct = drift * 100.0 if np.isfinite(drift) else None
        if self.output_dir:
            self.export(result)
        return result

    def export(self, result: RunResult) -> None:
        """Write the reference's FULL export set (odomEstimationNode.cpp:
        66-121,373-387 and utils.cpp:3-106) plus KITTI/TUM trajectories and
        a metrics summary. Per-scan clouds are the registered sensor-frame
        feature clouds collected by the pipeline at zero extra compute."""
        from .io import export as ex

        out = self.output_dir
        out.mkdir(parents=True, exist_ok=True)
        ec = self.cfg.export
        ex.save_kitti_trajectory(out / "trajectory_kitti.txt", result.quats,
                                 result.trans)
        ex.save_frame_info(out / "frame_info.jsonl", self.pipe.frames)
        ex.save_tum_trajectory(out / "trajectory_tum.txt", result.stamps,
                               result.quats, result.trans)
        clouds = self.pipe.sensor_clouds() if self.pipe.collect_clouds else []
        n = min(len(clouds), len(result.stamps))
        if ec.save_merged and n:
            ex.save_merged(out, clouds[:n], result.quats[:n],
                           result.trans[:n],
                           downsample_leaf=ec.output_downsample_size)
        if ec.save_posegraph:
            # keyframe-gated vertices with their clouds (SavePosegraph,
            # utils.cpp:3-78 — the reference also dumps per-keyframe dirs)
            kf = [i for i, fr in enumerate(self.pipe.frames[:n])
                  if fr.is_keyframe] or list(range(n))
            ex.save_posegraph(out / "posegraph",
                              result.quats[kf], result.trans[kf],
                              result.stamps[kf],
                              clouds=[clouds[i] for i in kf] if n else None)
        if ec.save_balm:
            ex.save_balm(out / "balm", result.quats[:n], result.trans[:n],
                         result.stamps[:n], clouds=clouds[:n])
        if ec.save_odom and n:
            ex.save_odom(out / "odom", result.quats[:n], result.trans[:n],
                         result.stamps[:n], clouds=clouds[:n])
        if self.global_map is not None:
            from .io.pcd import write_pcd

            pts = self.global_map.get_map()
            if len(pts):
                write_pcd(out / "map.pcd", pts[:, :3], pts[:, 3])
        summary = {
            **self.meter.summary(),  # timing telemetry (post-warmup)
            "frames": int(len(result.stamps)),
            "scans_per_sec": result.scans_per_sec,
            "ate_m": result.ate,
            "drift_pct": result.drift_pct,
        }
        (out / "summary.json").write_text(json.dumps(summary, indent=2))


def run_kitti_sequence(seq_dir, cfg: Optional[FloamConfig] = None,
                       poses_path=None, output_dir=None, max_frames=None,
                       progress_every: int = 50) -> RunResult:
    """Run a KITTI odometry sequence directory end to end."""
    from .io.kitti import KittiSequence

    cfg = cfg or FloamConfig.kitti_hdl64()
    seq = KittiSequence(seq_dir, cfg.lidar, poses_path=poses_path)
    runner = SequenceRunner(cfg, output_dir=output_dir)

    def gen():
        for i, (stamp, scan) in enumerate(seq):
            if max_frames and i >= max_frames:
                break
            yield stamp, scan

    gt = None
    if seq.poses is not None:
        q, t = seq.poses
        if max_frames:
            q, t = q[:max_frames], t[:max_frames]
        gt = (q, t)
    return runner.run(gen(), gt=gt, progress_every=progress_every)
