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
from .types import HostBackedWire, RingScan
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


def chunked_device_stream(host_stream: Iterable[Tuple[float, np.ndarray]],
                          chunk: int = 8) -> Iterator:
    """Adapt a (stamp, packed host scan) stream into a (stamp, packed
    DEVICE scan) stream whose uploads happen one STACKED chunk at a time.

    On a tunneled/streamed runtime an H2D upload only completes behind the
    work already queued on the device (~queue-depth x step time — the
    measured per-frame upload convoy in docs/PERFORMANCE.md); stacking
    ``chunk`` frames into one transfer pays that wait once per chunk
    instead of once per frame. Meant to run inside the runner's producer
    thread: iterate `SequenceRunner.run(chunked_device_stream(gen()))`.
    Per-frame items come back as cheap device slices of the chunk."""
    buf: list = []

    def flush():
        stamps = [s for s, _ in buf]
        payloads = [p for _, p in buf]
        buf.clear()
        if isinstance(payloads[0], tuple):  # e.g. pack_host_q16 pairs
            devs = tuple(jnp.asarray(np.stack([p[k] for p in payloads]))
                         for k in range(len(payloads[0])))
            for j, s in enumerate(stamps):
                # carry the host source bytes alongside the device slices:
                # host-side consumers (global-map feed) then cost zero
                # device->host traffic (types.HostBackedWire)
                item = HostBackedWire(tuple(d[j] for d in devs))
                item.host = payloads[j]
                yield s, item
        else:
            dev = jnp.asarray(np.stack(payloads))
            for j, s in enumerate(stamps):
                yield s, dev[j]

    for item in host_stream:
        buf.append(item)
        if len(buf) >= chunk:
            yield from flush()
    if buf:
        yield from flush()


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
    #: wall rate with ALL outlier frames excluded: any frame whose
    #: host-side sample exceeds 10x the median is dropped from the steady
    #: rate — that catches first-use jit compiles / persistent-cache loads
    #: (the intended target; a 240-frame run spends most of its wall in a
    #: handful of them) but ALSO any in-loop stall that happens to land in
    #: a frame (keyframe drains, BA dispatch). Interpret it as "the rate
    #: of a typical frame", not "rate excluding compilation only";
    #: scans_per_sec is the honest whole-run number.
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
        # cloud-bearing exports need the per-scan registered feature clouds
        # accumulated on the HOST (the reference's Dump accumulation,
        # odomEstimationNode.cpp:284-287) — they stream to an on-disk spool
        # via a background fetch thread so neither the frame loop nor host
        # RSS pays for them. Windowed BA only needs the most recent DEVICE
        # clouds (keep_clouds=False): a BA-only run does zero cloud
        # device->host traffic.
        cloud_exports = bool(output_dir) and (
            ec.save_balm or ec.save_posegraph or ec.save_odom
            or ec.save_merged)
        collect = cloud_exports or cfg.ba.enabled or cfg.loop.enabled
        spool_path = (Path(output_dir) / "clouds.spool") \
            if cloud_exports else None
        self.pipe = Pipeline(cfg, dtype=dtype, collect_clouds=collect,
                             keep_clouds=cloud_exports,
                             spool_path=spool_path)
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
        #: per-window refined poses, device-side: [(frame_idxs, (K,4) q,
        #: (K,3) t)]; collapsed to a per-keyframe dict (last window wins)
        #: by _materialize_ba_poses at export
        self._ba_results: list = []
        self._ba_poses: dict = {}  # frame_idx -> (q_refined, t_refined) np
        self._ba_fn = None
        #: keyframe-flag batch whose device->host copy is in flight: the
        #: flags of drain batch N are READ one batch later, after
        #: copy_to_host_async has had a whole batch of frames to complete
        #: — the read then costs ~0 instead of a blocking ~25 ms
        #: round trip (docs/PERFORMANCE.md)
        import collections

        self._kf_inflight = collections.deque()
        #: host-side per-stage time attribution for the product loop (the
        #: reference's per-frame ms telemetry, odomEstimationNode.cpp:
        #: 226-234, broken down by stage)
        from .utils.profiling import ScopedTimers

        self.timers = ScopedTimers()
        #: background global-map feed (the mapping node, process #3 of the
        #: reference, laserMappingNode.cpp:52-101): keyframe (scan, pose)
        #: pairs are queued here and a worker thread decodes the wire-format
        #: scan on the host and feeds GlobalMap — the frame loop never
        #: blocks on the per-keyframe device->host cloud fetch, and the
        #: re-voxelize batches over however many keyframes queued up
        self._map_queue = None
        self._map_thread = None
        self._map_err: list = []
        self._drop_warned = False
        # --- loop-closure back-end state (cfg.loop; floam_tpu.posegraph):
        # stored keyframe nodes (host poses + host feature clouds fetched
        # on a background thread), async registration results, accepted
        # edges for the export ---
        self._kf_poses: dict = {}  # frame_idx -> (q (4,), t (3,)) host
        self._kf_store: dict = {}  # frame_idx -> host cloud planes
        self._store_pending: list = []
        self._store_queue = None
        self._store_thread = None
        self._registrar = None
        self._loop_pending: list = []  # [(i, j, PairResult device)]
        self._loop_edges: list = []  # accepted (a, b, dq, dt) host
        self._loop_attempts = 0
        self._last_loop_attempt = -(10 ** 9)
        self._kf_counter = 0

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
            # rebuild full-width pose rows ([q, t, kf, drop counters] —
            # FrameRecord layout): the counters of pre-checkpoint frames
            # are not persisted, so they restore as 0
            row = np.concatenate([
                np.asarray(qs[i], np.float64),
                np.asarray(ts[i], np.float64),
                [1.0 if (kf is not None and kf[i]) else 0.0],
                np.zeros((3,), np.float64)])
            runner.pipe.frames.append(FrameRecord(float(st[i]), row))
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
        src = iter(_producer_iter(scans, timeout_s=idle_timeout_s))
        n = 0
        # Keyframe-gated work (global map feed, BA window) drains in
        # batches of kf_check_every frames: reading rec.is_keyframe right
        # after process() blocks the host on the step it just dispatched
        # AND pays a device->host round trip per frame — at tunneled-TPU
        # latencies that serialized the loop to ~1/10 of the device rate.
        track_kf = (self.global_map is not None) or self.cfg.ba.enabled \
            or self.cfg.loop.enabled
        pending: list = []  # [(frame_idx, rec, scan?, clouds)]
        t_loop0 = time.perf_counter()
        while True:
            with self.timers.scope("source_wait"):
                item = next(src, None)
            if item is None:
                break
            stamp, scan = item
            with self.meter.frame():
                with self.timers.scope("process_dispatch"):
                    rec = self.pipe.process(scan, stamp)
                if track_kf:
                    pending.append(
                        (len(self.pipe.frames) - 1, rec,
                         scan if self.global_map is not None else None,
                         self.pipe.last_clouds))
                    if len(pending) >= self.kf_check_every:
                        with self.timers.scope("kf_drain"):
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

        with self.timers.scope("kf_drain_final"):
            self._drain_keyframes(pending, final=True)
        if self.global_map is not None:
            with self.timers.scope("map_feed_drain"):
                self._join_map_feed()
        if n and self.pipe._initialized:
            with self.timers.scope("device_drain"):
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
        self._materialize_ba_poses()
        corrected = False
        if self._ba_poses:
            result.quats, result.trans = self._apply_ba(qs, ts)
            corrected = True
        if self.cfg.loop.enabled:
            self._flush_kf_store()
            if self._store_queue is not None:
                self._store_queue.join()
            self._solve_loops(result)
            corrected = corrected or bool(self._loop_edges)
        if gt is not None:
            from . import metrics

            gt_q, gt_t = gt
            m = min(len(gt_t), len(ts))
            result.ate, _ = metrics.ate(result.trans[:m], gt_t[:m])
            drift, _ = metrics.kitti_drift(result.quats[:m],
                                           result.trans[:m], gt_q[:m],
                                           gt_t[:m])
            result.drift_pct = drift * 100.0 if np.isfinite(drift) else None
            if corrected:
                result.ate_odom, _ = metrics.ate(ts[:m], gt_t[:m])
        if self.output_dir:
            self.export(result)
        return result

    # ------------------------------------------------------------------
    # Windowed BA (cfg.ba)
    # ------------------------------------------------------------------

    def _drain_keyframes(self, pending: list, final: bool = False) -> None:
        """Batched + PIPELINED deferred keyframe work (see run()): batch
        N's flags/poses are stacked into one transfer whose device->host
        copy is STARTED now (copy_to_host_async) but READ at batch N+1's
        drain — by then the copy has long finished and the read is free,
        so the frame loop never blocks on a flag round trip. The fetched
        flag is cached back into the record so later reads (checkpoint,
        export) never touch the device again. Keyframe handling thus lags
        the frame loop by up to 2*kf_check_every frames — semantically
        fine: the global-map feed and BA window consume frame-indexed
        data, not loop position. ``final`` forces both phases through."""
        if pending:
            stacked = jnp.stack([r._row for _, r, _, _ in pending])
            try:
                stacked.copy_to_host_async()
            except AttributeError:  # older jax.Array without the hint
                pass
            self._kf_inflight.append((list(pending), stacked))
            pending.clear()
        self._consume_kf_inflight(final)

    def _consume_kf_inflight(self, final: bool = False) -> None:
        """Consume every in-flight flag batch whose device->host copy has
        FINISHED (is_ready) — never block the frame loop on one that has
        not (on a tunneled runtime the async-copy hint is not honored and
        a blocking read costs a ~140 ms round trip per batch, measured).
        Unready batches stay queued and are re-checked at the next drain;
        ``final`` forces everything through. Keyframe handling can thus
        lag the frame loop by any number of batches — semantically fine,
        as the consumers are frame-indexed (see _drain_keyframes)."""
        ready = []
        while self._kf_inflight:
            entries, stacked = self._kf_inflight[0]
            if not final:
                try:
                    if not stacked.is_ready():
                        break
                except AttributeError:  # backend without is_ready
                    pass
            self._kf_inflight.popleft()
            ready.append((entries, stacked))
        if not ready:
            return
        # ONE device_get for every ready batch: per-call round-trip
        # latency (tens of ms tunneled) is paid once, not per batch
        with self.timers.scope("kf_flag_fetch"):
            fetched = jax.device_get([st for _, st in ready])
        for (entries, _), rows in zip(ready, fetched):
            self._consume_kf_batch(entries, rows)

    def _consume_kf_batch(self, entries, rows) -> None:
        # warn ONCE when the map hash table sheds points (row[10]): unlike
        # the scan budgets — whose truncation is the designed uniform
        # decimation, counted in summary.json but expected — a map-insert
        # drop is always a mis-sized table losing geometry silently
        if not self._drop_warned and rows.shape[1] >= 11 \
                and float(rows[:, 10].sum()) > 0:
            self._drop_warned = True
            tot = rows[:, 8:11].sum(axis=0).astype(int)
            print(f"[floam_tpu] WARNING: map hash-table overflow is "
                  f"dropping points (map_insert={tot[2]} so far; scan "
                  f"budget shed edge={tot[0]} surf={tot[1]}) — raise "
                  "OdomConfig.map_*_table / map_insert_probe_rounds (see "
                  "summary.json dropped_points)", flush=True)
        for (idx, rec, scan, clouds), row in zip(entries, rows):
            # keep the DEVICE pose row for the BA window before caching
            # the host value into the record: feeding cached numpy poses
            # to the jitted BA call would re-upload small host arrays per
            # window (~5 ms latency each through the tunnel)
            row_dev = rec._row
            rec._row = np.asarray(row)
            if rec.is_keyframe:
                self._handle_keyframe(idx, rec, scan, clouds, row_dev)

    def _viz_update(self, stamp: float) -> None:
        """Publish a live snapshot (trajectory + map) — the analogue of the
        reference's /map republish + hector trajectory display, but
        rate-limited and bounded instead of O(whole map) every frame
        (laserMappingNode.cpp:85-92). Only frames whose pose rows have
        already reached the host are drawn: a snapshot that lags the loop
        by a drain batch is fine for a viewer, a stacked blocking fetch
        of every in-flight row on the frame loop is not."""
        from . import odometry

        self.pipe.materialize_ready_rows()
        frames = [f for f in self.pipe.frames
                  if isinstance(f._row, np.ndarray)]
        if not frames:
            return
        traj = np.stack([f.pose_t for f in frames])
        if self.global_map is not None and self.global_map.num_points:
            pts = self.global_map.get_map()
        else:
            edge, surf = odometry.get_map_points(self.pipe.state)
            pts = np.concatenate([edge.to_numpy_valid(),
                                  surf.to_numpy_valid()])
        self.viz.update(traj, pts, stamp=stamp,
                        scans_per_sec=self.meter.summary().get(
                            "scans_per_sec", 0.0), force=True)

    def _handle_keyframe(self, frame_idx: int, rec, scan, clouds,
                         row_dev=None) -> None:
        if self.global_map is not None and scan is not None:
            self._ensure_map_thread()
            # bounded queue = back-pressure: if the mapping feed cannot
            # keep up, the frame loop throttles (the reference's analogue
            # is its queue-backlog warning, odomEstimationNode.cpp:179-181)
            self._map_queue.put(
                (scan, rec.pose_q.copy(), rec.pose_t.copy()))
        if self.cfg.ba.enabled:
            self._on_keyframe(frame_idx, clouds,
                              row_dev if row_dev is not None else rec._row)
        if self.cfg.loop.enabled and clouds is not None:
            self._on_loop_keyframe(frame_idx, rec, clouds)

    # ------------------------------------------------------------------
    # Loop-closure back-end (cfg.loop; floam_tpu.posegraph)
    # ------------------------------------------------------------------

    def _on_loop_keyframe(self, frame_idx: int, rec, clouds) -> None:
        """Store every Nth keyframe as a pose-graph node (host pose now,
        host clouds via a background batched fetch) and attempt a loop
        registration when the pose revisits an old stored node. The
        registration itself is an async jitted device program — only its
        DISPATCH happens here; results are read once, at end of run."""
        lc = self.cfg.loop
        self._kf_counter += 1
        if (self._kf_counter - 1) % lc.keyframe_stride:
            return
        q = np.asarray(rec.pose_q, np.float64).copy()
        t = np.asarray(rec.pose_t, np.float64).copy()
        self._kf_poses[frame_idx] = (q, t)
        edge, surf = clouds
        self._store_pending.append((frame_idx, edge, surf))
        if len(self._store_pending) >= 4:
            self._flush_kf_store()
        # --- revisit detection (host, O(stored nodes)) ---
        if self._loop_attempts >= lc.max_attempts or \
                frame_idx - self._last_loop_attempt < lc.attempt_every:
            return
        best = None
        for j, (qj, tj) in self._kf_poses.items():
            if frame_idx - j < lc.min_index_gap or j not in self._kf_store:
                continue
            d = float(np.linalg.norm(t - tj))
            if d < lc.detect_radius and (best is None or d < best[1]):
                best = (j, d)
        if best is None:
            return
        j = best[0]
        self._last_loop_attempt = frame_idx
        self._loop_attempts += 1
        if self._registrar is None:
            from . import posegraph

            self._registrar = posegraph.make_pair_registrar(
                self.cfg, rounds=lc.register_rounds, dtype=self.pipe.dtype)
        from .ops import se3

        qj, tj = self._kf_poses[j]
        q0, t0 = se3.pose_compose(
            *se3.pose_inverse(jnp.asarray(qj, self.pipe.dtype),
                              jnp.asarray(tj, self.pipe.dtype)),
            jnp.asarray(q, self.pipe.dtype),
            jnp.asarray(t, self.pipe.dtype))
        st = self._kf_store[j]
        with self.timers.scope("loop_dispatch"):
            res = self._registrar(
                jnp.asarray(st["e_xyz"]), jnp.asarray(st["e_mask"]),
                jnp.asarray(st["s_xyz"]), jnp.asarray(st["s_mask"]),
                edge.xyz, edge.mask, surf.xyz, surf.mask, q0, t0)
        self._loop_pending.append((frame_idx, j, res))

    def _flush_kf_store(self) -> None:
        """Hand pending stored-keyframe clouds to a background fetch
        thread as ONE stacked transfer (the cloud-spool pattern)."""
        if not self._store_pending:
            return
        self._ensure_store_thread()
        idxs = [i for i, _, _ in self._store_pending]
        chunk = (
            jnp.stack([e.xyz for _, e, _ in self._store_pending]),
            jnp.stack([e.mask for _, e, _ in self._store_pending]),
            jnp.stack([s.xyz for _, _, s in self._store_pending]),
            jnp.stack([s.mask for _, _, s in self._store_pending]),
        )
        self._store_pending.clear()
        self._store_queue.put((idxs, chunk))

    def _ensure_store_thread(self) -> None:
        import queue
        import threading

        if self._store_thread is not None:
            return
        self._store_queue = queue.Queue(maxsize=8)

        def worker():
            while True:
                item = self._store_queue.get()
                try:
                    if item is None:
                        return
                    idxs, chunk = item
                    try:
                        ex, em, sx, sm = jax.device_get(chunk)
                        for k, idx in enumerate(idxs):
                            self._kf_store[idx] = dict(
                                e_xyz=ex[k], e_mask=em[k],
                                s_xyz=sx[k], s_mask=sm[k])
                    except BaseException as e:
                        self._map_err.append(e)
                finally:
                    self._store_queue.task_done()

        self._store_thread = threading.Thread(target=worker, daemon=True)
        self._store_thread.start()

    def _solve_loops(self, result: RunResult) -> None:
        """End-of-run pose-graph solve: fetch every pending registration
        result in one transfer, gate acceptance, optimize the stored
        keyframe chain with the accepted loop edges, and propagate the
        correction to the full trajectory (posegraph.apply_refined_poses).
        Replaces the external lio_sam back-end of the reference deployment
        (launch/structor_slam.launch:50-52)."""
        lc = self.cfg.loop
        if not (lc.enabled and self._loop_pending):
            return
        from . import posegraph

        with self.timers.scope("loop_solve"):
            fetched = jax.device_get([r for _, _, r in self._loop_pending])
            accepted = []
            for (i, j, _), res in zip(self._loop_pending, fetched):
                n = int(res.num_edge) + int(res.num_surf)
                mean_cost = float(res.cost) / max(n, 1)
                if n >= lc.min_factors and mean_cost <= lc.max_cost:
                    # edge a=j -> b=i with Z = T_j^-1 T_i as measured
                    accepted.append((j, i, np.asarray(res.q, np.float64),
                                     np.asarray(res.t, np.float64)))
            self._loop_edges = accepted
            if not accepted:
                return
            nodes = sorted(self._kf_poses)
            pos = {f: k for k, f in enumerate(nodes)}
            q_nodes = result.quats[nodes]
            t_nodes = result.trans[nodes]
            ei, ej, dq, dt = posegraph.chain_edges(q_nodes, t_nodes)
            w = np.tile([lc.rot_weight] * 3 + [lc.trans_weight] * 3,
                        (len(ei), 1))
            for a, b, zq, zt in accepted:
                ei = np.concatenate([ei, [pos[a]]]).astype(np.int32)
                ej = np.concatenate([ej, [pos[b]]]).astype(np.int32)
                dq = np.concatenate([dq, [zq]])
                dt = np.concatenate([dt, [zt]])
                w = np.concatenate(
                    [w, [[lc.rot_weight * lc.loop_weight_scale] * 3
                         + [lc.trans_weight * lc.loop_weight_scale] * 3]])
            q2, t2 = posegraph.optimize_pose_graph_jit(
                jnp.asarray(q_nodes), jnp.asarray(t_nodes), ei, ej,
                jnp.asarray(dq), jnp.asarray(dt), jnp.asarray(w),
                iters=lc.iters, damping=lc.damping)
            refined = {f: (np.asarray(q2)[k], np.asarray(t2)[k])
                       for k, f in enumerate(nodes)}
            result.quats, result.trans = posegraph.apply_refined_poses(
                refined, result.quats, result.trans)

    # ------------------------------------------------------------------
    # Global-map feed (the reference's mapping node, process #3)
    # ------------------------------------------------------------------

    @staticmethod
    def _scan_host_cloud(scan):
        """Decode ANY stream-item scan representation to host (xyz (N, 3),
        mask (N,), intensity (N,) | None): a RingScan (device or host), a
        packed (R, C, 5|6) f32 plane, or a quantized q16 wire tuple — the
        q16 fetch moves only the ~0.5 MB wire bytes and dequantizes on the
        host (RingScan.unpack_host_q16); a HostBackedWire (what
        chunked_device_stream yields) decodes from its retained host
        bytes at ZERO device->host cost."""
        host = getattr(scan, "host", None)
        if host is not None:  # HostBackedWire: no D2H at all
            xyz, _, mask, inten = RingScan.unpack_host_q16(*host)
            return xyz.reshape(-1, 3), mask.reshape(-1), inten.reshape(-1)
        if isinstance(scan, RingScan):
            xyz, mask, inten = jax.device_get(
                (scan.xyz, scan.mask, scan.intensity))
            return (np.asarray(xyz).reshape(-1, 3),
                    np.asarray(mask).reshape(-1),
                    np.asarray(inten).reshape(-1))
        if isinstance(scan, tuple):  # (data u16, counts, meta) q16 wire
            data, counts, meta = jax.device_get(scan)
            xyz, _, mask, inten = RingScan.unpack_host_q16(
                data, counts, meta)
            return xyz.reshape(-1, 3), mask.reshape(-1), inten.reshape(-1)
        d = np.asarray(jax.device_get(scan))  # packed f32 plane
        return (d[..., :3].reshape(-1, 3),
                (d[..., 4] > 0.5).reshape(-1),
                d[..., 5].reshape(-1) if d.shape[-1] > 5 else None)

    def _ensure_map_thread(self) -> None:
        import queue
        import threading

        if self._map_thread is not None:
            return
        self._map_queue = queue.Queue(maxsize=32)

        def worker():
            q = self._map_queue
            while True:
                batch = [q.get()]
                try:
                    while True:
                        batch.append(q.get_nowait())
                except queue.Empty:
                    pass
                stop = False
                last_t = None
                try:
                    for item in batch:
                        if item is None:
                            stop = True
                            continue
                        scan, pose_q, pose_t = item
                        try:
                            xyz, mask, _ = self._scan_host_cloud(scan)
                            self.global_map.update_host(
                                xyz, pose_q, pose_t, mask=mask,
                                revoxelize=False)
                            last_t = pose_t
                        except BaseException as e:
                            self._map_err.append(e)
                    if last_t is not None:
                        # ONE batched device re-voxelize per drained batch
                        # (exact: the filter is idempotent and dirty blocks
                        # stay tracked until filtered)
                        try:
                            self.global_map.revoxelize(last_t)
                        except BaseException as e:
                            self._map_err.append(e)
                finally:
                    for _ in batch:
                        q.task_done()
                if stop:
                    return

        self._map_thread = threading.Thread(target=worker, daemon=True)
        self._map_thread.start()

    def _join_map_feed(self) -> None:
        """Block until every queued keyframe has been folded into the
        global map; surface worker failures in the caller (a silently
        truncated map is a wrong export)."""
        if self._map_queue is not None:
            self._map_queue.join()
        if self._map_err:
            raise self._map_err[0]

    def _on_keyframe(self, frame_idx: int, clouds, row_dev) -> None:
        """Track the keyframe window; run BA every cfg.ba.every keyframes
        once the window is full."""
        bc = self.cfg.ba
        clouds = clouds if clouds is not None else self.pipe.last_clouds
        if clouds is None:
            return
        edge, surf = clouds
        self._kf_window.append((frame_idx, edge, surf, row_dev))
        if len(self._kf_window) > bc.window:
            self._kf_window.pop(0)
        self._kf_since_ba += 1
        if len(self._kf_window) == bc.window and \
                self._kf_since_ba >= bc.every:
            self._run_ba()
            self._kf_since_ba = 0

    def _run_ba(self) -> None:
        import jax

        from .parallel.windowed_ba import window_ba_from_clouds

        bc = self.cfg.ba
        if self._ba_fn is None:
            # window slicing + stacking happen INSIDE the jitted program:
            # the previous eager version dispatched ~40 small slice/stack
            # device ops per window, each paying tunneled dispatch latency
            # on the frame loop's critical path
            oc, eb, sb = self.cfg.odom, bc.edge_budget, bc.surf_budget

            def ba_call(map_state, e_xyzs, e_masks, s_xyzs, s_masks,
                        rows):
                e_xyz = jnp.stack([x[:eb] for x in e_xyzs])
                e_mask = jnp.stack([m[:eb] for m in e_masks])
                s_xyz = jnp.stack([x[:sb] for x in s_xyzs])
                s_mask = jnp.stack([m[:sb] for m in s_masks])
                stacked = jnp.stack(rows)  # (K, 8) pose rows
                return window_ba_from_clouds(
                    map_state, e_xyz, e_mask, s_xyz, s_mask,
                    stacked[:, :4], stacked[:, 4:7], oc=oc,
                    iters=bc.iters, prior_weight=bc.prior_weight,
                    damping=bc.damping)

            self._ba_fn = jax.jit(ba_call)
        idxs = [i for i, _, _, _ in self._kf_window]
        with self.timers.scope("ba_dispatch"):
            q2, t2 = self._ba_fn(
                self.pipe.state.map,
                tuple(e.xyz for _, e, _, _ in self._kf_window),
                tuple(e.mask for _, e, _, _ in self._kf_window),
                tuple(s.xyz for _, _, s, _ in self._kf_window),
                tuple(s.mask for _, _, s, _ in self._kf_window),
                tuple(r for _, _, _, r in self._kf_window))
        # keep the refined poses device-side AND unsliced: syncing (or even
        # eagerly slicing) here costs dispatch latency per window on the
        # frame loop; _apply_ba fetches every window in one transfer at
        # export and later windows overwrite earlier ones per keyframe
        self._ba_results.append((idxs, q2, t2))

    def _materialize_ba_poses(self) -> None:
        """Collapse the accumulated per-window refined poses to one pose
        per keyframe (later windows overwrite earlier ones where they
        overlap — the sliding window refines each keyframe several times)
        with ONE batched device->host transfer for all windows."""
        if not self._ba_results:
            return
        fetched = jax.device_get([(q, t) for _, q, t in self._ba_results])
        for (idxs, _, _), (q2, t2) in zip(self._ba_results, fetched):
            for j, i in enumerate(idxs):
                self._ba_poses[i] = (q2[j], t2[j])
        self._ba_results.clear()

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
        self._materialize_ba_poses()
        # one batched device->host fetch of all record fields up front
        # (per-frame reads below would pay a round trip each)
        self.pipe.materialize_records()
        ex.save_kitti_trajectory(out / "trajectory_kitti.txt", result.quats,
                                 result.trans)
        ex.save_frame_info(out / "frame_info.jsonl", self.pipe.frames)
        ex.save_tum_trajectory(out / "trajectory_tum.txt", result.stamps,
                               result.quats, result.trans)
        # clouds is list-like but possibly disk-backed (CloudSpool): every
        # cloud-bearing exporter below iterates lazily, one scan in RAM at
        # a time — host memory stays flat however long the run was
        clouds = self.pipe.sensor_clouds() if self.pipe.keep_clouds else []
        n = min(len(clouds), len(result.stamps))
        if ec.save_merged and n:
            ex.save_merged(out, (clouds[i] for i in range(n)),
                           result.quats[:n], result.trans[:n],
                           downsample_leaf=ec.output_downsample_size)
        if ec.save_posegraph:
            # keyframe-gated vertices with their clouds (SavePosegraph,
            # utils.cpp:3-78 — the reference also dumps per-keyframe dirs)
            flags = self.pipe.keyframe_flags()[:n]
            kf = [i for i in range(n) if flags[i]] or list(range(n))
            # accepted loop constraints ride the g2o as extra EDGE_SE3:QUAT
            # lines between their keyframe vertices
            vert = {f: k for k, f in enumerate(kf)}
            extra = [(vert[a], vert[b], zq, zt)
                     for a, b, zq, zt in self._loop_edges
                     if a in vert and b in vert]
            ex.save_posegraph(out / "posegraph",
                              result.quats[kf], result.trans[kf],
                              result.stamps[kf],
                              clouds=(clouds[i] for i in kf) if n else None,
                              extra_edges=extra or None)
        if ec.save_balm:
            ex.save_balm(out / "balm", result.quats[:n], result.trans[:n],
                         result.stamps[:n],
                         clouds=(clouds[i] for i in range(n)))
        if ec.save_odom and n:
            ex.save_odom(out / "odom", result.quats[:n], result.trans[:n],
                         result.stamps[:n],
                         clouds=(clouds[i] for i in range(n)))
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
            "loop_attempts": self._loop_attempts,
            "loop_edges": len(self._loop_edges),
            "drift_pct": result.drift_pct,
            # capacity-overflow counters (0 = no silent truncation
            # anywhere in the run); per-frame values in frame_info.jsonl
            "dropped_points": self.pipe.drop_totals(),
            # host-side per-stage attribution (ms totals) of the run loop
            "host_stage_ms": {k: round(v * 1e3, 1)
                              for k, v in self.timers.totals.items()},
        }
        (out / "summary.json").write_text(json.dumps(summary, indent=2))


def run_rosbag_sequence(bag_path, cfg: Optional[FloamConfig] = None,
                        cloud_topic: Optional[str] = None,
                        imu_topic: Optional[str] = None,
                        output_dir=None, max_frames: Optional[int] = None,
                        progress_every: int = 50, **runner_kw) -> RunResult:
    """Run a recorded ROS1 bag end to end — the reference's primary
    deployment input (rosbag replay into the three nodes, README.md:59-67;
    topics at laserProcessingNode.cpp:201-204). PointCloud2 clouds carry
    real per-point ring/time/intensity (vel_point::PointXYZIRT,
    lidar.h:15-32) into `bin_to_ring_scan(rings=, times=)`, and Imu
    orientation samples feed `Pipeline.add_imu` for the rotational-deskew
    path. Defaults to the structor_vlp16 preset (the config the recordings
    were made for)."""
    from .io.kitti import bin_to_ring_scan
    from .io.rosbag import RosbagSource

    cfg = cfg or FloamConfig.structor_vlp16()
    runner = SequenceRunner(cfg, output_dir=output_dir, **runner_kw)
    src = RosbagSource(bag_path, cloud_topic=cloud_topic,
                      imu_topic=imu_topic)

    def make_scan(stamp, payload):
        inten = payload["intensity"]
        raw = np.concatenate(
            [payload["xyz"],
             (inten if inten is not None
              else np.zeros(len(payload["xyz"]), np.float32))[:, None]],
            axis=1)
        return stamp, bin_to_ring_scan(raw, cfg.lidar,
                                       rings=payload["ring"],
                                       times=payload["time"])

    def gen():
        # DETERMINISTIC IMU feed: a scan's sweep-covering IMU messages
        # come AFTER the scan in bag order, and this generator runs on the
        # producer thread while the consumer deskews — so a scan is held
        # back until an IMU sample past its sweep end has been fed (the
        # queue hand-off then orders the buffer write before the consumer
        # read). Without this, whether a given scan gets deskewed depends
        # on thread timing.
        from collections import deque

        margin = 1.5 * cfg.lidar.scan_period
        pending = deque()
        latest_imu = -np.inf
        n = 0
        for kind, stamp, payload in src:
            if kind == "imu":
                runner.pipe.add_imu(stamp, payload)
                latest_imu = max(latest_imu, stamp)
            else:
                if max_frames is not None and n >= max_frames:
                    break
                pending.append((stamp, payload))
                n += 1
            while pending and latest_imu > pending[0][0] + margin:
                yield make_scan(*pending.popleft())
        while pending:  # tail scans: stream ended, feed what we have
            yield make_scan(*pending.popleft())

    return runner.run(gen(), progress_every=progress_every)


def run_kitti_sequence(seq_dir, cfg: Optional[FloamConfig] = None,
                       poses_path=None, output_dir=None, max_frames=None,
                       progress_every: int = 50) -> RunResult:
    """Run a KITTI odometry sequence directory end to end."""
    from .io.kitti import KittiSequence

    cfg = cfg or FloamConfig.kitti_hdl64()
    seq = KittiSequence(seq_dir, cfg.lidar, poses_path=poses_path)
    runner = SequenceRunner(cfg, output_dir=output_dir)

    def gen():
        # non-IMU runs stream the quantized chunked wire format (the fast
        # host->device path); IMU-deskew runs need host time/mask planes
        src = seq.iter_packed_q16() if not cfg.deskew.enabled else iter(seq)
        it = src if cfg.deskew.enabled else \
            chunked_device_stream(src, chunk=8)
        for i, (stamp, scan) in enumerate(it):
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
