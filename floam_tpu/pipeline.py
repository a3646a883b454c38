"""Host-side pipeline driver.

The reference runs three OS processes chained over ROS topics with worker
threads polling mutex-guarded queues at 2 ms (laserProcessingNode /
odomEstimationNode / laserMappingNode; SURVEY.md section 2 C8-C10). Here the
whole front-end — deskew, feature extraction, downsampling, scan-to-map
registration, local-map maintenance — is ONE jitted device program per scan;
this module is only the thin host loop around it: streaming input, state
carry, trajectory recording, timing telemetry, and export triggers.
"""
from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import odometry
from .config import FloamConfig
from .ops import deskew as deskew_ops
from .ops import features, voxelmap
from .types import OdomState, PointBatch, Pose, RingScan


def _center_times(scan: RingScan) -> RingScan:
    """Re-base per-point times to the scan center (CenterTime,
    src/laserProcessingNode.cpp:65-78) so the phase-1 registration of a
    skewed cloud lands on the mid-sweep pose and the velocity estimate used
    for deskew is unbiased."""
    t = scan.time
    big = jnp.asarray(jnp.inf, t.dtype)
    tmin = jnp.min(jnp.where(scan.mask, t, big))
    tmax = jnp.max(jnp.where(scan.mask, t, -big))
    has = jnp.any(scan.mask)
    center = jnp.where(has, 0.5 * (tmin + tmax), 0.0)
    return scan._replace(time=t - center)


@functools.lru_cache(maxsize=None)
def _bitrev_perm(n: int) -> Tuple[int, ...]:
    """Bit-reversal permutation of [0, n) (n a power of two): consecutive
    prefix lengths of the permuted order are maximally-uniform subsamples."""
    bits = n.bit_length() - 1
    return tuple(int(f"{i:0{bits}b}"[::-1], 2) for i in range(n))


def _features_from_scan(scan: RingScan, cfg: FloamConfig
                        ) -> Tuple[PointBatch, PointBatch]:
    edge, surf, _ = _features_from_scan_counted(scan, cfg)
    return edge, surf


def _features_from_scan_counted(scan: RingScan, cfg: FloamConfig):
    """Feature clouds compacted to the association query budgets — the TPU
    analogue of the reference's scan-side VoxelGrid downsample
    (downSamplingToMap, src/odomEstimationClass.cpp:137-142). k-NN gather
    cost is linear in query-slot count (docs/PERFORMANCE.md), so both
    clouds are prefix-compacted into dense buffers in an order that makes
    any overflow drop spatially uniform:

    * edges come from the greedy selector's per-(ring, sector) slot
      buffers, reordered RANK-major (all sectors' strongest picks first,
      then every second-strongest, ...) so capacity overflow sheds the
      weakest edges evenly across sectors;
    * the surf cloud is an azimuthally strided structural subsample of the
      surf-mask, reordered by BIT-REVERSED azimuth column so overflow sheds
      uniformly-spaced azimuth columns.
    """
    scan = _center_times(scan)
    (_, surf_mask, e_xyz, e_time, e_valid,
     e_inten) = features.extract_features_full(scan, cfg.features)
    R = surf_mask.shape[0]
    S = cfg.features.sectors_per_ring
    EPS = cfg.features.edges_per_sector
    RS = R * S
    # (RS*EPS, ...) slot-major -> (EPS*RS, ...) rank-major
    e_xyz = e_xyz.reshape(RS, EPS, 3).transpose(1, 0, 2).reshape(-1, 3)
    e_time = e_time.reshape(RS, EPS).T.reshape(-1)
    e_valid = e_valid.reshape(RS, EPS).T.reshape(-1)
    e_inten = e_inten.reshape(RS, EPS).T.reshape(-1)
    ex, em, et, ei = voxelmap.compact_points(
        e_xyz, e_valid, cfg.odom.scan_edge_capacity,
        extras=(e_time, e_inten))
    edge = PointBatch(xyz=ex, mask=em, time=et, intensity=ei)

    C = surf_mask.shape[1]
    per_ring = max(1, cfg.odom.scan_surf_slots // R)
    stride = max(1, C // per_ring)
    cols = 1 << (C // stride).bit_length() - 1  # power-of-two column count
    perm = jnp.asarray(_bitrev_perm(cols), jnp.int32) * stride
    # static-index column gather (compile-time constant: fast class), then
    # column-major flatten so prefix order interleaves azimuth columns
    s_xyz = scan.xyz[:, perm].transpose(1, 0, 2).reshape(-1, 3)
    s_mask = (surf_mask & scan.mask)[:, perm].T.reshape(-1)
    s_time = scan.time[:, perm].T.reshape(-1)
    s_inten = scan.intensity[:, perm].T.reshape(-1)
    sx, sm, st, si = voxelmap.compact_points(
        s_xyz, s_mask, cfg.odom.scan_surf_capacity,
        extras=(s_time, s_inten))
    surf = PointBatch(xyz=sx, mask=sm, time=st, intensity=si)
    # capacity-overflow counters: VALID candidates shed by the compaction
    # budgets (the deliberate structural subsampling above is not counted —
    # only what the budgets truncate). Surfaced via OdomDiagnostics /
    # pose_row so undersized presets are visible, not silent ATE loss.
    e_drop = jnp.maximum(
        jnp.sum(e_valid.astype(jnp.int32)) - cfg.odom.scan_edge_capacity, 0)
    s_drop = jnp.maximum(
        jnp.sum(s_mask.astype(jnp.int32)) - cfg.odom.scan_surf_capacity, 0)
    return edge, surf, (e_drop, s_drop)


def full_step(state: OdomState, scan: RingScan, cfg: FloamConfig,
              return_clouds: bool = False):
    """Feature extraction + scan-to-map registration as one program.

    With cfg.odom.deskew, runs the reference's two-phase
    UpdatePointsToMapSelector flow (src/odomEstimationClass.cpp:34-50):
    cheap initial registration -> constant-velocity linear deskew of the
    feature clouds (CompensateVelocity, src/dataHandler.cpp:82-92) ->
    full refinement with map update.

    ``return_clouds`` (static) additionally returns the sensor-frame
    (edge, surf) feature clouds — the cloud the reference accumulates into
    its exit-time Dump (odomEstimationNode.cpp:284-287) — at zero extra
    compute.

    ``scan`` may be a RingScan, a packed (R, C, 5|6) plane
    (RingScan.pack_host), or a quantized (u16 data, counts) pair
    (RingScan.pack_host_q16) — the split/decode then happens in-program,
    so streaming hosts pay one (small) upload dispatch per frame.
    """
    if not isinstance(scan, RingScan):
        if isinstance(scan, tuple):  # quantized (data, counts) pair
            scan = RingScan.from_packed_q16(
                *scan, capacity=cfg.lidar.points_per_ring)
        else:
            scan = RingScan.from_packed(scan)
    edge, surf, drops = _features_from_scan_counted(scan, cfg)
    if not cfg.odom.deskew:
        state2, diag = odometry.odom_step_impl(state, edge, surf, cfg,
                                               scan_dropped=drops)
        if return_clouds:
            return state2, diag, (edge, surf)
        return state2, diag

    # initial iteration: register without updating the map. Reference quirk 3
    # passes the edge cloud as both edge and surf (:40); configurable.
    surf0 = edge if cfg.odom.deskew_initial_edge_as_surf else surf
    state1, _ = odometry.odom_step_impl(state, edge, surf0, cfg,
                                        update_map=False)
    vel_world = odometry.get_velocity(state1, cfg.lidar.scan_period)
    # rotate into the sensor frame before correcting sensor-frame points
    # (the reference applies the world-frame velocity directly,
    # src/dataHandler.cpp:87 — correct only at small accumulated rotation;
    # we implement the intent)
    from .ops import se3
    vel = se3.quat_rotate(se3.quat_conj(state1.pose.q)[None, :],
                          vel_world[None, :])[0]
    edge_d = deskew_ops.compensate_velocity(edge, vel)
    surf_d = deskew_ops.compensate_velocity(surf, vel)
    # refinement: start from the registered pose, no re-prediction
    # (REFINEMENT_AND_UPDATE intent, :63-68), map update keyframe-gated.
    state2, diag = odometry.odom_step_impl(state1, edge_d, surf_d, cfg,
                                           predict=False,
                                           scan_dropped=drops)
    if return_clouds:
        return state2, diag, (edge_d, surf_d)
    return state2, diag


@dataclasses.dataclass
class FrameRecord:
    """Per-frame result. The pose snapshot is ONE device-backed (8,) row
    ([q wxyz, t xyz, is_keyframe] — diag.pose_row, a freshly-computed step
    output that never aliases donated state buffers) converted lazily:
    forcing a host readback every frame costs ~10-100x the whole device
    step in sync latency (the reference's equivalent is its per-frame ROS
    publish, which is also fire-and-forget)."""

    stamp: float
    _row: Any  # (8,) jax array until materialized, then np.ndarray
    _n_edge: Any = None
    _n_surf: Any = None

    def host_row(self) -> np.ndarray:
        if not isinstance(self._row, np.ndarray):
            self._row = np.asarray(self._row)
        return self._row

    @property
    def pose_q(self) -> np.ndarray:
        return self.host_row()[:4]

    @property
    def pose_t(self) -> np.ndarray:
        return self.host_row()[4:7]

    @property
    def is_keyframe(self) -> bool:
        return bool(self.host_row()[7] > 0.5)

    @property
    def dropped_points(self) -> Tuple[int, int, int]:
        """(scan_edge, scan_surf, map_insert) capacity-overflow counts for
        this frame (0s for rows recorded before the counters existed)."""
        row = self.host_row()
        if len(row) < 11:
            return (0, 0, 0)
        return (int(row[8]), int(row[9]), int(row[10]))

    @property
    def num_edge_factors(self) -> int:
        return int(self._n_edge) if self._n_edge is not None else 0

    @property
    def num_surf_factors(self) -> int:
        return int(self._n_surf) if self._n_surf is not None else 0


class Pipeline:
    """Streaming SLAM front-end (the analogue of running the reference's
    laserProcessing + odomEstimation nodes, single process, one device)."""

    def __init__(self, cfg: FloamConfig, dtype=jnp.float32,
                 collect_clouds: bool = False, cloud_flush_every: int = 32,
                 keep_clouds: Optional[bool] = None,
                 spool_path=None, max_inflight: int = 128):
        """``collect_clouds``: the jitted step additionally RETURNS the
        per-scan feature clouds (device buffers; +~0.7 ms/frame — needed
        by windowed BA and by cloud-bearing exports). ``keep_clouds``
        (default: same as collect_clouds): additionally accumulate those
        clouds on the HOST for export. The host fetch runs on a
        background thread in stacked chunks, so the frame loop never
        blocks on a device->host transfer; with ``spool_path`` set the
        fetched clouds stream straight to an on-disk CloudSpool and host
        RSS stays O(one chunk) for arbitrarily long runs (the fix for the
        reference's unbounded exit-time Dump, odomEstimationNode.cpp:
        284-287). BA-only runs pass keep_clouds=False and do ZERO cloud
        device->host traffic.

        ``max_inflight`` bounds how far the async dispatch loop may run
        AHEAD of actual device execution: every in-flight step pins its
        upload chunk and cloud buffers on the host, so an unthrottled
        producer-paced loop grows RSS linearly with run length (measured
        ~0.6 MB/frame on the 2,400-frame endurance run,
        docs/endurance.jsonl). Every 16 frames the loop waits for the
        step dispatched ``max_inflight`` frames ago — a no-op when the
        device keeps up, a bounded stall (instead of unbounded memory)
        when it does not. 0 disables."""
        self.cfg = cfg
        self._max_inflight = max_inflight
        self.dtype = dtype
        self.state = odometry.init_state(cfg, dtype)
        self._step = jax.jit(
            functools.partial(full_step, cfg=cfg,
                              return_clouds=collect_clouds),
            donate_argnums=(0,))
        self.frames: List[FrameRecord] = []
        #: per-scan SENSOR-frame feature clouds (edge + surf) as (n, 4)
        #: XYZI — the reference's Dump accumulation
        #: (odomEstimationNode.cpp:284-287) with intensity carried through
        #: (VelToIntensityCopy, odomEstimationClass.cpp:308-318).
        self.collect_clouds = collect_clouds
        self.keep_clouds = collect_clouds if keep_clouds is None \
            else (keep_clouds and collect_clouds)
        self.clouds = [] if spool_path is None else None
        self._spool = None
        self._spool_path = spool_path
        #: most recent (edge, surf) device feature clouds (windowed-BA feed)
        self.last_clouds: Optional[Tuple[PointBatch, PointBatch]] = None
        self._pending_clouds: List[Any] = []
        self._cloud_flush_every = cloud_flush_every
        self._fetch_queue = None  # lazily-started background fetch thread
        self._fetch_thread = None
        self._fetch_err: List[BaseException] = []
        self._times_ms: List[float] = []
        self._initialized = False
        #: host-side IMU buffer for the rotational-deskew path
        self.imu = deskew_ops.ImuStream(cfg.deskew.imu_window)
        from .ops import se3 as _se3

        r, p, y = cfg.deskew.extrinsic_rpy
        self._extrinsic_q = jnp.asarray(
            _se3.euler_to_quat(r, p, y), dtype)

    def add_imu(self, stamp: float, orientation_wxyz) -> bool:
        """Feed an IMU orientation sample (imuSubscriber + ImuHandler::AddMsg,
        src/laserProcessingNode.cpp:84-89, src/dataHandler.cpp:24-40)."""
        return self.imu.add(stamp, orientation_wxyz)

    def _apply_imu_deskew(self, scan: RingScan, stamp: float) -> RingScan:
        """Rotational deskew + orientation alignment (the laserProcessing
        node's Compensate + ImuNowT transform, laserProcessingNode.cpp:
        108-121). Skips the scan's compensation when IMU data does not
        cover it (:109-112 prints and drops; here we fall through to the
        uncompensated cloud so odometry still runs)."""
        t = np.asarray(scan.time)
        m = np.asarray(scan.mask)
        if not m.any():
            return scan
        t0 = stamp + float(t[m].min())
        t1 = stamp + float(t[m].max())
        if not (self.imu.contains(t0) and self.imu.contains(t1)):
            return scan
        stamps, quats, n = self.imu.window(t0, t1)
        out, q_init = deskew_ops.rotational_deskew(
            scan, jnp.asarray(stamp, self.dtype), jnp.asarray(stamps),
            jnp.asarray(quats), jnp.asarray(n), self._extrinsic_q,
            slerp=self.cfg.deskew.slerp)
        return deskew_ops.align_to_orientation(out, q_init)

    def process(self, scan, stamp: float = 0.0) -> FrameRecord:
        """``scan``: a RingScan, or a packed (R, C, 5|6) plane / its
        device upload (the zero-extra-dispatch streaming path; IMU-deskew
        runs need the host time/mask planes and unpack eagerly)."""
        t0 = time.perf_counter()
        cap = self.cfg.lidar.points_per_ring

        def unpack(s):
            if isinstance(s, RingScan):  # must test BEFORE tuple: a
                return s  # NamedTuple IS a tuple
            if isinstance(s, tuple):
                return RingScan.from_packed_q16(*s, capacity=cap)
            return RingScan.from_packed(s)

        if self.cfg.deskew.enabled:
            scan = self._apply_imu_deskew(unpack(scan), stamp)
        if not self._initialized:
            scan = unpack(scan)
            edge, surf = _features_from_scan(scan, self.cfg)
            self.state = odometry.init_map(self.state, edge, surf, self.cfg)
            self._initialized = True
            rec = FrameRecord(stamp, np.array(
                [1.0, 0, 0, 0, 0, 0, 0, 1.0, 0, 0, 0],
                np.dtype(self.dtype)))
            if self.collect_clouds:
                self.last_clouds = (edge, surf)
                if self.keep_clouds:
                    self._pending_clouds.append((edge, surf))
        else:
            if self.collect_clouds:
                self.state, diag, clouds = self._step(self.state, scan)
                self.last_clouds = clouds
                if self.keep_clouds:
                    self._pending_clouds.append(clouds)
            else:
                self.state, diag = self._step(self.state, scan)
            # device-backed record: diag.pose_row is already a distinct
            # step output — recording costs zero extra dispatches
            rec = FrameRecord(stamp, diag.pose_row,
                              diag.num_edge_factors, diag.num_surf_factors)
        self._times_ms.append((time.perf_counter() - t0) * 1e3)
        self.frames.append(rec)
        if len(self._pending_clouds) >= self._cloud_flush_every:
            self._flush_clouds()
        k = len(self.frames)
        if self._max_inflight and k > self._max_inflight and k % 16 == 0:
            lag_row = self.frames[k - 1 - self._max_inflight]._row
            if not isinstance(lag_row, np.ndarray):
                jax.block_until_ready(lag_row)
        return rec

    def _ensure_fetch_thread(self):
        import queue
        import threading

        if self._fetch_thread is not None:
            return
        if self._spool_path is not None:
            from .io.spool import CloudSpool

            self._spool = CloudSpool(self._spool_path, mode="w")
        self._fetch_queue = queue.Queue(maxsize=8)

        def worker():
            while True:
                item = self._fetch_queue.get()
                try:
                    if item is None:
                        return
                    try:
                        fetched = jax.device_get(item)
                        e_xyz, e_mask, e_int, s_xyz, s_mask, s_int = fetched
                        for i in range(e_xyz.shape[0]):
                            em, sm = e_mask[i], s_mask[i]
                            cloud = np.concatenate([
                                np.concatenate(
                                    [e_xyz[i][em], e_int[i][em][:, None]],
                                    axis=1),
                                np.concatenate(
                                    [s_xyz[i][sm], s_int[i][sm][:, None]],
                                    axis=1)])
                            if self._spool is not None:
                                self._spool.append(cloud)
                            else:
                                self.clouds.append(cloud)
                    except BaseException as e:  # surfaced in sensor_clouds
                        self._fetch_err.append(e)
                finally:
                    self._fetch_queue.task_done()

        self._fetch_thread = threading.Thread(target=worker, daemon=True)
        self._fetch_thread.start()

    def _flush_clouds(self) -> None:
        """Hand pending device cloud buffers to the background fetch
        thread as ONE stacked chunk.

        The stack is a handful of async device dispatches; the actual
        device->host transfer (the expensive part: ~25 ms latency +
        ~40-50 MB/s over a tunneled TPU runtime, docs/PERFORMANCE.md)
        happens entirely on the fetch thread, so the frame loop never
        blocks on it. Chunked stacking also keeps transfer count at
        6 arrays per `cloud_flush_every` frames instead of 6 per frame."""
        if not self._pending_clouds:
            return
        self._ensure_fetch_thread()
        chunk = (
            jnp.stack([e.xyz for e, _ in self._pending_clouds]),
            jnp.stack([e.mask for e, _ in self._pending_clouds]),
            jnp.stack([e.intensity for e, _ in self._pending_clouds]),
            jnp.stack([s.xyz for _, s in self._pending_clouds]),
            jnp.stack([s.mask for _, s in self._pending_clouds]),
            jnp.stack([s.intensity for _, s in self._pending_clouds]),
        )
        self._pending_clouds.clear()
        self._fetch_queue.put(chunk)

    def sensor_clouds(self):
        """All per-scan sensor-frame (n, 4) XYZI feature clouds collected
        so far — a host list, or the disk-backed CloudSpool (list-like,
        O(one scan) RSS) when a spool path was configured. Blocks until
        the background fetch thread has drained every pending chunk."""
        self._flush_clouds()
        if self._fetch_queue is not None:
            self._fetch_queue.join()
        if self._fetch_err:
            raise self._fetch_err[0]
        return self._spool if self._spool is not None else self.clouds

    # --- telemetry (the reference logged avg ms/frame + speed,
    #     odomEstimationNode.cpp:226-234) ---
    @property
    def avg_ms_per_frame(self) -> float:
        if not self._times_ms:
            return 0.0
        return float(np.mean(self._times_ms[1:])) if len(self._times_ms) > 1 \
            else self._times_ms[0]

    def _materialize_rows(self) -> None:
        """ONE stacked device->host transfer for every still-device-backed
        pose row (a per-record read costs a round trip each)."""
        dev = [f for f in self.frames if not isinstance(f._row, np.ndarray)]
        if dev:
            fetched = jax.device_get(jnp.stack([f._row for f in dev]))
            for f, row in zip(dev, fetched):
                f._row = np.asarray(row)

    def keyframe_flags(self) -> np.ndarray:
        """(N,) bool keyframe gate per frame (one stacked transfer)."""
        self._materialize_rows()
        return np.asarray([f.is_keyframe for f in self.frames])

    def materialize_ready_rows(self) -> int:
        """Fetch to host (one stacked transfer) every device-backed pose
        row whose step has already EXECUTED — never blocking on in-flight
        work. Returns the number of host-available frames afterwards.
        Live-viz uses this: the snapshot may lag the loop by the dispatch
        runahead, but the frame loop never stalls behind it."""
        dev = []
        for f in self.frames:
            if isinstance(f._row, np.ndarray):
                continue
            try:
                if not f._row.is_ready():
                    continue
            except AttributeError:
                pass
            dev.append(f)
        if dev:
            rows = jax.device_get(jnp.stack([f._row for f in dev]))
            for f, row in zip(dev, rows):
                f._row = np.asarray(row)
        return sum(1 for f in self.frames
                   if isinstance(f._row, np.ndarray))

    def materialize_records(self) -> None:
        """Fetch every device-backed frame-record field to host in a few
        stacked transfers (pose rows, factor counts) and cache them back,
        so per-frame record reads during export never pay a device round
        trip each."""
        self._materialize_rows()
        dev = [f for f in self.frames
               if f._n_edge is not None
               and not isinstance(f._n_edge, (int, np.integer))]
        if dev:
            ne, ns = jax.device_get((jnp.stack([f._n_edge for f in dev]),
                                     jnp.stack([f._n_surf for f in dev])))
            for f, a, b in zip(dev, ne, ns):
                f._n_edge, f._n_surf = int(a), int(b)

    def drop_totals(self) -> Dict[str, int]:
        """Run-total capacity-overflow counters (see
        FrameRecord.dropped_points); one stacked transfer."""
        self._materialize_rows()
        tot = np.zeros(3, np.int64)
        for f in self.frames:
            tot += np.asarray(f.dropped_points, np.int64)
        return {"scan_edge": int(tot[0]), "scan_surf": int(tot[1]),
                "map_insert": int(tot[2])}

    def trajectory(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(stamps (N,), quats (N,4) wxyz, trans (N,3)); one batched
        device->host transfer for the whole trajectory."""
        if not self.frames:
            return np.zeros((0,)), np.zeros((0, 4)), np.zeros((0, 3))
        self._materialize_rows()
        st = np.array([f.stamp for f in self.frames])
        rows = np.stack([f.host_row() for f in self.frames])
        return st, rows[:, :4], rows[:, 4:7]
