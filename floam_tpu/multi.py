"""Multi-chip product entry: run MANY sequences through the engine on a
device mesh, end to end — mesh build, sharded stepping, in-loop
distributed BA, per-sequence exports.

The reference's deployed artifact is its launch file starting the whole
pipeline on one machine (launch/structor_odom.launch:43-45); its only
scale story is three overlapping processes. The TPU-native deployment
axis is different: one engine instance per device advancing independent
sequences in lockstep (data parallelism over the "dp" mesh axis — each
lane's map lives with its shard, so stepping needs zero cross-device
communication and scaling is embarrassingly parallel), with the windowed
BA refinement running as one sharded program over the same mesh.

Single-sequence map scale-out (the "mp" axis) stays in
parallel/sharded_map.py; this module is the throughput product path that
BASELINE.json's "scans/s/chip over batched sequences" metric measures.
"""
from __future__ import annotations

import functools
import json
from pathlib import Path
from typing import Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import odometry
from .config import FloamConfig
from .pipeline import _features_from_scan, full_step
from .runner import RunResult, _producer_iter
from .types import RingScan
from .utils.profiling import RateMeter


def build_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    """A 1-D mesh over the available devices (TPU chips when present)."""
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            devices = jax.devices("cpu")
        devices = devices[:n_devices]
    return Mesh(np.array(devices).reshape(len(devices)), (axis,))


def make_sharded_full_step(mesh: Mesh, cfg: FloamConfig, lanes: int,
                           return_clouds: bool = False, axis: str = "dp"):
    """Jitted lockstep update for ``lanes`` sequences sharded over
    ``axis``: per lane the SAME fused per-scan program as the single-chip
    product (features -> association -> IRLS GN -> keyframe-gated map
    merge) under vmap; the custom-vmap sparse rules (ops/sparse.py) keep
    every gather in the fast shape class."""
    if lanes % mesh.shape[axis]:
        raise ValueError(f"lanes={lanes} must divide over "
                         f"{mesh.shape[axis]} '{axis}' devices")
    if cfg.odom.deskew:
        raise NotImplementedError(
            "two-phase deskew is single-sequence only for now; disable "
            "OdomConfig.deskew for batched multi-chip runs")
    cfg = odometry.pin_assoc_backend(cfg, mesh.devices.flat[0].platform)
    spec = P(axis)

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=(spec, spec),
                       out_specs=(spec, spec) + ((spec,) if return_clouds
                                                 else ()), check_vma=False)
    def sharded(states, scans):
        out = jax.vmap(functools.partial(
            full_step, cfg=cfg, return_clouds=return_clouds))(states, scans)
        return out

    return jax.jit(sharded, donate_argnums=(0,)), cfg


def make_sharded_window_ba(mesh: Mesh, cfg: FloamConfig,
                           axis: str = "dp"):
    """Per-lane windowed BA as ONE sharded program: each device refines
    its lanes' keyframe windows locally (vmap inside shard_map); poses
    come back stacked (B, K, 4|3)."""
    from .parallel.windowed_ba import window_ba_from_clouds

    bc = cfg.ba
    oc = odometry.pin_assoc_backend(
        cfg, mesh.devices.flat[0].platform).odom
    eb, sb = bc.edge_budget, bc.surf_budget
    spec = P(axis)

    def one_lane(map_state, e_xyz, e_mask, s_xyz, s_mask, quats, trans):
        return window_ba_from_clouds(
            map_state, e_xyz[:, :eb], e_mask[:, :eb], s_xyz[:, :sb],
            s_mask[:, :sb], quats, trans, oc=oc, iters=bc.iters,
            prior_weight=bc.prior_weight, damping=bc.damping)

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(spec,) * 7, out_specs=(spec, spec),
                       check_vma=False)
    def sharded(map_states, e_xyz, e_mask, s_xyz, s_mask, quats, trans):
        return jax.vmap(one_lane)(map_states, e_xyz, e_mask, s_xyz,
                                  s_mask, quats, trans)

    return jax.jit(sharded)


class MultiSequenceRunner:
    """Advance B sequences in lockstep over a ("dp",) mesh and export each
    lane's artifact set — the multi-chip deployment entry point
    (`run_multi` in VERDICT terms).

    Batched-mode semantics notes (deliberate dense-batching tradeoffs,
    mirroring the vmapped map update):
      * lanes advance in lockstep; a lane whose stream ends early keeps
        "processing" its last scan but its recorded trajectory stops;
      * windowed BA runs on a sliding window of the last `ba.window`
        FRAMES at a fixed frame cadence (per-lane keyframe gating would
        diverge control flow across lanes; in motion virtually every
        frame is a keyframe anyway).
    """

    def __init__(self, cfg: FloamConfig, lanes: Optional[int] = None,
                 mesh: Optional[Mesh] = None,
                 n_devices: Optional[int] = None,
                 output_dir=None, dtype=jnp.float32):
        self.mesh = mesh if mesh is not None else build_mesh(n_devices)
        self.B = lanes if lanes is not None else int(
            np.prod(self.mesh.devices.shape))
        self.cfg = cfg
        self.dtype = dtype
        self.output_dir = Path(output_dir) if output_dir else None
        with_ba = cfg.ba.enabled
        self._step, self._cfg_pinned = make_sharded_full_step(
            self.mesh, cfg, self.B, return_clouds=with_ba)
        self._ba_fn = make_sharded_window_ba(self.mesh, cfg) \
            if with_ba else None
        self._shard = NamedSharding(self.mesh, P("dp"))
        self.meter = RateMeter()
        # per-frame stacked (B,) device records, fetched once at the end
        self._stamps: List[np.ndarray] = []
        self._qs: List = []
        self._ts: List = []
        self._kfs: List = []
        self._cloud_window: List = []  # deque of (edge, surf) stacked
        self._ba_results: List = []  # [(frame_idxs, (B,K,4) q, (B,K,3) t)]
        self.states = None
        self._frame = 0

    def _upload(self, scans: Sequence[RingScan]) -> RingScan:
        """Stack B per-lane host scans into one sharded device RingScan
        (one device_put per field; each device receives only its lanes)."""
        def stack(field):
            arrs = [np.asarray(getattr(s, field)) for s in scans]
            return jax.device_put(np.stack(arrs), self._shard)

        return RingScan(xyz=stack("xyz"), intensity=stack("intensity"),
                        time=stack("time"), mask=stack("mask"))

    def run(self, sources: Sequence[Iterable[Tuple[float, RingScan]]],
            gt: Optional[Sequence] = None,
            progress_every: int = 0) -> List[RunResult]:
        """``sources``: B per-lane (stamp, scan) iterables (host or device
        scans). Lanes run in lockstep until the longest stream ends."""
        if len(sources) != self.B:
            raise ValueError(f"need {self.B} sources, got {len(sources)}")
        bc = self.cfg.ba

        def lockstep():
            # a lane whose stream ends early keeps re-feeding its last
            # scan (no motion -> its keyframe gate stops merging); the
            # per-lane trajectory is truncated to real frames at export
            its = [iter(s) for s in sources]
            last = [None] * self.B
            while True:
                alive = 0
                for i, it in enumerate(its):
                    nxt = next(it, None)
                    if nxt is not None:
                        last[i] = nxt
                        alive += 1
                if not alive:
                    return
                yield list(last)

        src = _producer_iter(lockstep(), depth=2)
        init_fn = None
        for items in src:
            stamps = np.array([s for s, _ in items])
            scans = [sc for _, sc in items]
            with self.meter.frame():
                batched = self._upload(scans)
                if self.states is None:
                    # lane-0-style init on every lane (batched init_map)
                    from .parallel.batch import batched_init_state

                    if init_fn is None:
                        cfgp = self._cfg_pinned

                        @functools.partial(
                            jax.shard_map, mesh=self.mesh,
                            in_specs=(P("dp"), P("dp")),
                            out_specs=P("dp"), check_vma=False)
                        def init_all(states, scans_b):
                            e, s = jax.vmap(lambda sc: _features_from_scan(
                                sc, cfgp))(scans_b)
                            return jax.vmap(
                                lambda st, a, b: odometry.init_map_impl(
                                    st, a, b, cfgp))(states, e, s)

                        init_fn = jax.jit(init_all)
                    states0 = batched_init_state(self.cfg, self.B,
                                                 dtype=self.dtype)
                    states0 = jax.tree_util.tree_map(
                        lambda x: jax.device_put(x, self._shard), states0)
                    self.states = init_fn(states0, batched)
                    q = jnp.broadcast_to(
                        jnp.asarray([1.0, 0, 0, 0], self.dtype),
                        (self.B, 4))
                    t = jnp.zeros((self.B, 3), self.dtype)
                    kf = jnp.ones((self.B,), bool)
                else:
                    out = self._step(self.states, batched)
                    if self._ba_fn is not None:
                        self.states, diag, clouds = out
                        self._cloud_window.append(clouds)
                        if len(self._cloud_window) > bc.window:
                            self._cloud_window.pop(0)
                    else:
                        self.states, diag = out
                    # async device copies: the state buffers themselves are
                    # donated into the next step (runner.py pattern)
                    q = self.states.pose.q.copy()
                    t = self.states.pose.t.copy()
                    kf = diag.is_keyframe
                self._stamps.append(stamps)
                self._qs.append(q)
                self._ts.append(t)
                self._kfs.append(kf)
                self._frame += 1
                if (self._ba_fn is not None
                        and len(self._cloud_window) == bc.window
                        and self._frame % (bc.every * 2) == 0):
                    self._run_ba()
            if progress_every and self._frame % progress_every == 0:
                s = self.meter.summary()
                print(f"[floam_tpu multi] frame {self._frame}: "
                      f"{s.get('scans_per_sec', 0) * self.B:.1f} "
                      f"lane-scans/s aggregate", flush=True)
        jax.block_until_ready(self.states.pose.t)
        return self._finalize(gt)

    def _run_ba(self) -> None:
        w = self._cloud_window
        K = len(w)
        e_xyz = jnp.stack([e.xyz for e, _ in w], axis=1)  # (B, K, E, 3)
        e_mask = jnp.stack([e.mask for e, _ in w], axis=1)
        s_xyz = jnp.stack([s.xyz for _, s in w], axis=1)
        s_mask = jnp.stack([s.mask for _, s in w], axis=1)
        idxs = list(range(self._frame - K, self._frame))
        quats = jnp.stack([self._qs[i] for i in idxs], axis=1)  # (B, K, 4)
        trans = jnp.stack([self._ts[i] for i in idxs], axis=1)
        q2, t2 = self._ba_fn(self.states.map, e_xyz, e_mask, s_xyz,
                             s_mask, quats, trans)
        self._ba_results.append((idxs, q2, t2))

    def _finalize(self, gt) -> List[RunResult]:
        from . import metrics
        from .ops import se3

        n = len(self._stamps)
        qs, ts, kfs = jax.device_get(
            (jnp.stack(self._qs), jnp.stack(self._ts),
             jnp.stack(self._kfs)))  # (N, B, ...)
        ba = jax.device_get([(q, t) for _, q, t in self._ba_results])
        refined: dict = {}
        for (idxs, _, _), (q2, t2) in zip(self._ba_results, ba):
            for j, i in enumerate(idxs):
                refined[i] = (q2[:, j], t2[:, j])  # (B, 4), (B, 3)
        results = []
        for b in range(self.B):
            stamps = np.array([s[b] for s in self._stamps[:n]])
            q_l, t_l = qs[:, b], ts[:, b]
            res = RunResult(stamps=stamps, quats=q_l.copy(),
                            trans=t_l.copy(),
                            scans_per_sec=self.meter.summary().get(
                                "scans_per_sec", 0.0))
            if refined:
                kf_i = np.asarray(sorted(refined), np.int64)
                rq = np.stack([refined[i][0][b] for i in kf_i])
                rt = np.stack([refined[i][1][b] for i in kf_i])
                slot = np.searchsorted(kf_i, np.arange(n), side="right")
                dq, dt = se3.pose_compose(
                    jnp.asarray(rq), jnp.asarray(rt),
                    *se3.pose_inverse(jnp.asarray(q_l[kf_i]),
                                      jnp.asarray(t_l[kf_i])))
                dq = np.concatenate([[[1.0, 0, 0, 0]], np.asarray(dq)])
                dt = np.concatenate([np.zeros((1, 3)), np.asarray(dt)])
                cq, ct = se3.pose_compose(
                    jnp.asarray(dq[slot]), jnp.asarray(dt[slot]),
                    jnp.asarray(q_l), jnp.asarray(t_l))
                res.quats, res.trans = np.asarray(cq), np.asarray(ct)
            if gt is not None and gt[b] is not None:
                gt_q, gt_t = gt[b]
                m = min(len(gt_t), n)
                res.ate, _ = metrics.ate(res.trans[:m], gt_t[:m])
                if refined:
                    res.ate_odom, _ = metrics.ate(t_l[:m], gt_t[:m])
            results.append(res)
        if self.output_dir:
            self._export(results, kfs)
        return results

    def _export(self, results: List[RunResult], kfs: np.ndarray) -> None:
        """Per-lane export set (trajectories, frame info, posegraph) under
        output_dir/seq_XX/ — the same artifact surface as the single-chip
        runner minus the cloud-bearing files (multi-lane cloud spooling is
        a host-bandwidth tradeoff left to single-sequence runs)."""
        from .io import export as ex

        for b, res in enumerate(results):
            out = self.output_dir / f"seq_{b:02d}"
            out.mkdir(parents=True, exist_ok=True)
            ex.save_kitti_trajectory(out / "trajectory_kitti.txt",
                                     res.quats, res.trans)
            ex.save_tum_trajectory(out / "trajectory_tum.txt", res.stamps,
                                   res.quats, res.trans)
            n = len(res.stamps)
            flags = kfs[:n, b]
            kf = [i for i in range(n) if flags[i]] or list(range(n))
            ex.save_posegraph(out / "posegraph", res.quats[kf],
                              res.trans[kf], res.stamps[kf])
            (out / "summary.json").write_text(json.dumps({
                "frames": int(n),
                "ate_m": res.ate,
                "ate_odom_m": res.ate_odom,
                "aggregate_scans_per_sec":
                    res.scans_per_sec * self.B,
            }, indent=2))


def run_multi(cfg: FloamConfig,
              sources: Sequence[Iterable[Tuple[float, RingScan]]],
              n_devices: Optional[int] = None, output_dir=None,
              gt: Optional[Sequence] = None,
              progress_every: int = 0) -> List[RunResult]:
    """One-call multi-chip entry: build the ("dp",) mesh, run every source
    sequence in lockstep, write per-sequence exports."""
    runner = MultiSequenceRunner(cfg, lanes=len(sources),
                                 n_devices=n_devices,
                                 output_dir=output_dir)
    return runner.run(sources, gt=gt, progress_every=progress_every)
