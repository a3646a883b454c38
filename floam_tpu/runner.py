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

import jax
import jax.numpy as jnp
import numpy as np

from .config import FloamConfig
from .mapping import GlobalMap
from .pipeline import Pipeline
from .types import Pose, RingScan
from .utils.checkpoint import save_checkpoint
from .utils.profiling import RateMeter


def _producer_iter(source: Iterable, timeout_s: Optional[float] = None,
                   depth: int = 4) -> Iterator:
    """Producer-thread wrapper: the source is iterated on a background
    thread so its work — scan generation, disk reads, host->device
    uploads (RingScan.from_host inside a lazy generator) — overlaps the
    consumer's device loop. This is the reference's subscriber-queue
    pattern (laserProcessingNode.cpp:33-36,80-102); the bounded queue is
    the back-pressure. With ``timeout_s`` it doubles as the liveness
    watchdog (keep_running, odomEstimationNode.cpp:170-174): silence that
    long ends the stream gracefully."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    _END = object()
    err: list = []

    def pump():
        try:
            for item in source:
                q.put(item)
        except BaseException as e:
            err.append(e)
        q.put(_END)

    t = threading.Thread(target=pump, daemon=True)
    t.start()

    while True:
        try:
            item = q.get(timeout=timeout_s)
        except queue.Empty:
            print(f"[floam_tpu] no data for {timeout_s:.1f}s — "
                  "stopping and saving", flush=True)
            return
        if item is _END:
            if err:  # re-raise source failures in the consumer, not the
                raise err[0]  # thread — a silently truncated run is drift
            return
        yield item


@dataclasses.dataclass
class RunResult:
    stamps: np.ndarray
    quats: np.ndarray  # (N, 4) wxyz — BA-refined when cfg.ba.enabled
    trans: np.ndarray  # (N, 3)
    ate: Optional[float] = None
    #: ATE of the raw odometry trajectory (only set when BA ran)
    ate_odom: Optional[float] = None
    drift_pct: Optional[float] = None
    scans_per_sec: float = 0.0
    #: wall rate with compile-stall frames excluded (frames whose host-side
    #: sample exceeds 10x the median are first-use jit compiles / cache
    #: loads; a 240-frame run spends most of its wall in a handful of them)
    scans_per_sec_steady: float = 0.0


class SequenceRunner:
    def __init__(self, cfg: FloamConfig, dtype=jnp.float32,
                 with_global_map: bool = False,
                 output_dir: Optional[str] = None,
                 checkpoint_every: int = 0,
                 kf_check_every: int = 8,
                 viz_dir: Optional[str] = None, viz_every: int = 20):
        self.cfg = cfg
        ec = cfg.export
        # cloud-bearing exports and windowed BA need the per-scan registered
        # feature clouds (the reference's Dump accumulation,
        # odomEstimationNode.cpp:284-287)
        collect = (bool(output_dir) and (ec.save_balm or ec.save_posegraph
                                         or ec.save_odom or ec.save_merged)
                   ) or cfg.ba.enabled
        self.pipe = Pipeline(cfg, dtype=dtype, collect_clouds=collect)
        self.global_map = GlobalMap(cfg.mapping) if with_global_map else None
        self.output_dir = Path(output_dir) if output_dir else None
        self.checkpoint_every = checkpoint_every
        #: frames between keyframe-flag readbacks: each device->host fetch
        #: costs a full round trip (tens of ms on a tunneled TPU), so the
        #: flags of the last N frames are fetched as ONE stacked transfer
        #: and the keyframe work (global map feed, BA windows) drains in
        #: batches. Semantically identical — only the flag READ is delayed.
        self.kf_check_every = max(1, kf_check_every)
        #: live visualization sink (the rviz/-/map-republish analogue, C12)
        self.viz = None
        if viz_dir:
            from .viz import LiveViz

            self.viz = LiveViz(viz_dir, every=viz_every)
        self.viz_every = max(1, viz_every)
        self.meter = RateMeter()
        # --- in-loop windowed BA (cfg.ba): sliding keyframe window whose
        # refined poses feed the EXPORTED trajectory/posegraph; the live
        # front-end state is untouched (reference front-end/back-end split,
        # utils.cpp:3-78) ---
        self._kf_window: list = []  # [(frame_idx, edge PointBatch, surf)]
        self._kf_since_ba = 0
        self._ba_poses: dict = {}  # frame_idx -> (q_refined, t_refined) np
        self._ba_fn = None

    @classmethod
    def from_checkpoint(cls, path, cfg: FloamConfig, dtype=jnp.float32,
                        with_global_map: bool = False,
                        output_dir: Optional[str] = None,
                        checkpoint_every: int = 0) -> "SequenceRunner":
        """Resume a run from a checkpoint written by ``checkpoint_every``:
        restores the full odometry state (pose pair, voxel maps, keyframe
        gate, iteration budget), the trajectory recorded so far (with
        keyframe flags, so exports stay keyframe-gated), the global-map
        block store, and the IMU buffer. ``run()`` then continues exactly
        where the interrupted run left off — the consuming path the
        reference never had (its persistence is exit-only,
        src/odomEstimationNode.cpp:373-387)."""
        from .pipeline import FrameRecord
        from .utils.checkpoint import load_checkpoint, load_kf_flags

        runner = cls(cfg, dtype=dtype, with_global_map=with_global_map,
                     output_dir=output_dir, checkpoint_every=checkpoint_every)
        state, st, qs, ts = load_checkpoint(
            path, runner.pipe.state, global_map=runner.global_map,
            imu=runner.pipe.imu)
        runner.pipe.state = state
        runner.pipe._initialized = len(st) > 0
        kf = load_kf_flags(path)
        for i in range(len(st)):
            runner.pipe.frames.append(FrameRecord(
                float(st[i]), np.asarray(qs[i]), np.asarray(ts[i]),
                bool(kf[i]) if kf is not None else False))
        return runner

    def run(self, scans: Iterable[Tuple[float, RingScan]],
            gt: Optional[Tuple[np.ndarray, np.ndarray]] = None,
            progress_every: int = 0,
            idle_timeout_s: Optional[float] = None) -> RunResult:
        """Consume the scan stream. ``idle_timeout_s`` arms the liveness
        watchdog of the reference's odometry node (3 s of data silence
        triggers a graceful stop-and-save, src/odomEstimationNode.cpp:
        170-174): when the source yields nothing for that long, the run
        ends and exports are still written."""
        scans = _producer_iter(scans, timeout_s=idle_timeout_s)
        n = 0
        # Keyframe-gated work (global map feed, BA window) drains in
        # batches of kf_check_every frames: reading rec.is_keyframe right
        # after process() blocks the host on the step it just dispatched
        # AND pays a device->host round trip per frame — at tunneled-TPU
        # latencies that serialized the loop to ~1/10 of the device rate.
        track_kf = (self.global_map is not None) or self.cfg.ba.enabled
        pending: list = []  # [(frame_idx, rec, scan?, clouds)]
        t_loop0 = time.perf_counter()
        for stamp, scan in scans:
            with self.meter.frame():
                rec = self.pipe.process(scan, stamp)
                if track_kf:
                    pending.append(
                        (len(self.pipe.frames) - 1, rec,
                         scan if self.global_map is not None else None,
                         self.pipe.last_clouds))
                    if len(pending) >= self.kf_check_every:
                        self._drain_keyframes(pending)
            n += 1
            if self.viz is not None and n % self.viz_every == 0:
                self._viz_update(stamp)
            if progress_every and n % progress_every == 0:
                s = self.meter.summary()
                print(f"[floam_tpu] frame {n}: "
                      f"{s.get('scans_per_sec', 0):.1f} scans/s, "
                      f"p95 {s.get('p95_ms', 0):.1f} ms", flush=True)
            if (self.checkpoint_every and self.output_dir
                    and n % self.checkpoint_every == 0):
                st, qs, ts = self.pipe.trajectory()
                save_checkpoint(self.output_dir / "checkpoint.npz",
                                self.pipe.state, st, qs, ts,
                                global_map=self.global_map,
                                kf_flags=self.pipe.keyframe_flags(),
                                imu=self.pipe.imu)

        self._drain_keyframes(pending)
        if n and self.pipe._initialized:
            jax.block_until_ready(self.pipe.state.pose.t)
        # wall-clock rate over the whole loop INCLUDING the final device
        # drain — per-frame meter samples measure only dispatch latency
        # when nothing syncs, which would overstate throughput wildly
        wall = time.perf_counter() - t_loop0
        st, qs, ts = self.pipe.trajectory()
        samples = np.asarray(self.meter.samples_ms[-n:] if n else [])
        steady = 0.0
        if len(samples) >= 8:
            med = float(np.median(samples))
            stall = samples > 10.0 * med
            steady_wall = wall - float(samples[stall].sum()) * 1e-3
            steady_n = int(n - stall.sum())
            if steady_n > 0 and steady_wall > 0:
                steady = steady_n / steady_wall
        result = RunResult(stamps=st, quats=qs, trans=ts,
                           scans_per_sec=(n / wall if wall > 0 else 0.0),
                           scans_per_sec_steady=steady)
        if self._ba_poses:
            result.quats, result.trans = self._apply_ba(qs, ts)
        if gt is not None:
            from . import metrics

            gt_q, gt_t = gt
            m = min(len(gt_t), len(ts))
            result.ate, _ = metrics.ate(result.trans[:m], gt_t[:m])
            drift, _ = metrics.kitti_drift(result.quats[:m],
                                           result.trans[:m], gt_q[:m],
                                           gt_t[:m])
            result.drift_pct = drift * 100.0 if np.isfinite(drift) else None
            if self._ba_poses:
                result.ate_odom, _ = metrics.ate(ts[:m], gt_t[:m])
        if self.output_dir:
            self.export(result)
        return result

    # ------------------------------------------------------------------
    # Windowed BA (cfg.ba)
    # ------------------------------------------------------------------

    def _drain_keyframes(self, pending: list) -> None:
        """Batched deferred keyframe work (see run()): ONE stacked transfer
        fetches the pending frames' keyframe flags, then each keyframe's
        global-map feed / BA window runs in frame order. The fetched flag
        is cached back into the record so later reads (checkpoint, export)
        never touch the device again."""
        if not pending:
            return
        flags, qs, ts = jax.device_get(
            (jnp.stack([r._kf for _, r, _, _ in pending]),
             jnp.stack([r._q for _, r, _, _ in pending]),
             jnp.stack([r._t for _, r, _, _ in pending])))
        for (idx, rec, scan, clouds), kf, q, t in zip(pending, flags, qs,
                                                      ts):
            rec._kf, rec._q, rec._t = bool(kf), q, t
            if rec._kf:
                self._handle_keyframe(idx, rec, scan, clouds)
        pending.clear()

    def _viz_update(self, stamp: float) -> None:
        """Publish a live snapshot (trajectory + map) — the analogue of the
        reference's /map republish + hector trajectory display, but
        rate-limited and bounded instead of O(whole map) every frame."""
        from . import odometry

        self.pipe.materialize_records()
        if not self.pipe.frames:
            return
        traj = np.stack([np.asarray(f._t) for f in self.pipe.frames])
        if self.global_map is not None and self.global_map.num_points:
            pts = self.global_map.get_map()
        else:
            edge, surf = odometry.get_map_points(self.pipe.state)
            pts = np.concatenate([edge.to_numpy_valid(),
                                  surf.to_numpy_valid()])
        self.viz.update(traj, pts, stamp=stamp,
                        scans_per_sec=self.meter.summary().get(
                            "scans_per_sec", 0.0), force=True)

    def _handle_keyframe(self, frame_idx: int, rec, scan, clouds) -> None:
        if self.global_map is not None and scan is not None:
            xyz = np.asarray(scan.xyz).reshape(-1, 3)
            mask = np.asarray(scan.mask).reshape(-1)
            pose = Pose(q=jnp.asarray(rec.pose_q, jnp.float32),
                        t=jnp.asarray(rec.pose_t, jnp.float32))
            self.global_map.update(jnp.asarray(xyz), pose,
                                   mask=jnp.asarray(mask))
        if self.cfg.ba.enabled:
            self._on_keyframe(frame_idx, clouds)

    def _on_keyframe(self, frame_idx: int, clouds=None) -> None:
        """Track the keyframe window; run BA every cfg.ba.every keyframes
        once the window is full."""
        bc = self.cfg.ba
        clouds = clouds if clouds is not None else self.pipe.last_clouds
        if clouds is None:
            return
        edge, surf = clouds
        self._kf_window.append((frame_idx, edge, surf))
        if len(self._kf_window) > bc.window:
            self._kf_window.pop(0)
        self._kf_since_ba += 1
        if len(self._kf_window) == bc.window and \
                self._kf_since_ba >= bc.every:
            self._run_ba()
            self._kf_since_ba = 0

    def _run_ba(self) -> None:
        import functools

        import jax

        from .parallel.windowed_ba import window_ba_from_clouds

        bc = self.cfg.ba
        if self._ba_fn is None:
            self._ba_fn = jax.jit(functools.partial(
                window_ba_from_clouds, oc=self.cfg.odom, iters=bc.iters,
                prior_weight=bc.prior_weight, damping=bc.damping))
        idxs = [i for i, _, _ in self._kf_window]
        # prefix-sliced BA query budgets (see BAConfig.edge_budget)
        eb, sb = bc.edge_budget, bc.surf_budget
        e_xyz = jnp.stack([e.xyz[:eb] for _, e, _ in self._kf_window])
        e_mask = jnp.stack([e.mask[:eb] for _, e, _ in self._kf_window])
        s_xyz = jnp.stack([s.xyz[:sb] for _, _, s in self._kf_window])
        s_mask = jnp.stack([s.mask[:sb] for _, _, s in self._kf_window])
        quats = jnp.stack([self.pipe.frames[i]._q for i in idxs])
        trans = jnp.stack([self.pipe.frames[i]._t for i in idxs])
        q2, t2 = self._ba_fn(self.pipe.state.map, e_xyz, e_mask, s_xyz,
                             s_mask, quats, trans)
        # keep the refined poses device-side: syncing here costs a host
        # round trip per window; _apply_ba fetches them all at export
        for j, i in enumerate(idxs):
            self._ba_poses[i] = (q2[j], t2[j])

    def _apply_ba(self, quats: np.ndarray, trans: np.ndarray):
        """Correct the full trajectory with the refined keyframe poses:
        every frame after keyframe k moves by the world-frame delta
        refined_k o inv(odom_k) until the next refined keyframe.

        One batched device call for the whole trajectory (the previous
        per-frame dispatch loop cost minutes of pure overhead at KITTI
        sequence lengths)."""
        import jax

        from .ops import se3

        kf = np.asarray(sorted(self._ba_poses), np.int64)
        rq = jnp.stack([jnp.asarray(self._ba_poses[i][0]) for i in kf])
        rt = jnp.stack([jnp.asarray(self._ba_poses[i][1]) for i in kf])
        # frame j applies the delta of the latest refined keyframe <= j
        # (identity before the first): slot -1 -> prepended identity row
        slot = np.searchsorted(kf, np.arange(len(quats)), side="right")

        @jax.jit
        def correct(rq, rt, kq, kt, qs, ts, sel):
            iq, it = se3.pose_inverse(kq, kt)
            dq, dt = se3.pose_compose(rq, rt, iq, it)  # (K, 4/3)
            ident_q = jnp.array([[1.0, 0, 0, 0]], dq.dtype)
            dq = jnp.concatenate([ident_q, dq])
            dt = jnp.concatenate([jnp.zeros((1, 3), dt.dtype), dt])
            return se3.pose_compose(dq[sel], dt[sel], qs, ts)

        q_c, t_c = correct(rq, rt, jnp.asarray(quats[kf]),
                           jnp.asarray(trans[kf]), jnp.asarray(quats),
                           jnp.asarray(trans), jnp.asarray(slot))
        return np.asarray(q_c), np.asarray(t_c)

    def export(self, result: RunResult) -> None:
        """Write the reference's FULL export set (odomEstimationNode.cpp:
        66-121,373-387 and utils.cpp:3-106) plus KITTI/TUM trajectories and
        a metrics summary. Per-scan clouds are the registered sensor-frame
        feature clouds collected by the pipeline at zero extra compute."""
        from .io import export as ex

        out = self.output_dir
        out.mkdir(parents=True, exist_ok=True)
        ec = self.cfg.export
        # one batched device->host fetch of all record fields up front
        # (per-frame reads below would pay a round trip each)
        self.pipe.materialize_records()
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
            flags = self.pipe.keyframe_flags()[:n]
            kf = [i for i in range(n) if flags[i]] or list(range(n))
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
            "scans_per_sec_steady": result.scans_per_sec_steady,
            "ate_m": result.ate,
            "ate_odom_m": result.ate_odom,
            "ba_windows": len(self._ba_poses),
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
