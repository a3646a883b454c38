"""Isolate the per-round association re-rank cost (candidate_d2 +
select_k_mask + fused fits) from the per-scan gather cost, at benchmark
shapes. CHAINED (data-dependent) iterations — the tunneled runtime caches
results of identical dispatches, so unchained timing loops measure nothing.
Directs the Pallas A/B (docs/PERFORMANCE.md)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent.parent / ".jax_cache"))

import functools

import jax.numpy as jnp
import numpy as np

from floam_tpu.config import FloamConfig
from floam_tpu import odometry
from floam_tpu.odometry import _gather_candidates, _solve_from_candidates
from floam_tpu.ops import residuals, voxelmap
from floam_tpu.types import MapState, Pose


def timeit_chained(step, x0, n=100, label=""):
    """step: x -> x (same structure); chained so every call must execute."""
    x = step(x0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = step(x)
    jax.block_until_ready(x)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:52s} {ms:8.3f} ms")
    return x


def main():
    cfg = FloamConfig.kitti_hdl64()
    oc = cfg.odom
    rng = np.random.default_rng(0)
    state = odometry.init_state(cfg)
    pts = rng.uniform(-40, 40, (120_000, 3)).astype(np.float32)
    em = voxelmap.insert(state.map.edge, jnp.asarray(pts[:30_000]),
                         jnp.ones((30_000,), bool), oc.voxel_count_cap)
    sm = voxelmap.insert(state.map.surf, jnp.asarray(pts),
                         jnp.ones((pts.shape[0],), bool), oc.voxel_count_cap)
    ms_state = MapState(edge=em, surf=sm,
                        edge_view=voxelmap.pack_query_view(em),
                        surf_view=voxelmap.pack_query_view(sm))
    Qe, Qs = oc.scan_edge_capacity, oc.scan_surf_capacity
    e_xyz = jnp.asarray(rng.uniform(-30, 30, (Qe, 3)), jnp.float32)
    s_xyz = jnp.asarray(rng.uniform(-30, 30, (Qs, 3)), jnp.float32)
    e_mask = jnp.ones((Qe,), bool)
    s_mask = jnp.ones((Qs,), bool)
    pose0 = Pose.identity(jnp.float32)

    gather = jax.jit(functools.partial(
        _gather_candidates, oc=oc, margin=oc.assoc_margin))
    cand_e, d2_e, cand_s, d2_s = gather(
        pose0, ms_state, ms_state.edge_view, ms_state.surf_view,
        e_xyz, s_xyz)
    print("edge cand", cand_e[0].shape, "surf cand", cand_s[0].shape)

    @jax.jit
    def gather_step(pose):
        ce, de, cs, ds = gather(pose, ms_state, ms_state.edge_view,
                                ms_state.surf_view, e_xyz, s_xyz)
        # fold a data-dependent dribble back into the pose (tiny, bounded)
        bump = jnp.tanh(jnp.sum(de[0]) + jnp.sum(ds[0])) * 1e-7
        return Pose(q=pose.q, t=pose.t + bump)

    timeit_chained(gather_step, pose0,
                   label="gather both sides (query_candidates x2)")

    rerank = jax.jit(functools.partial(_solve_from_candidates, oc=oc))

    @jax.jit
    def rerank_step(pose):
        p2, stats = rerank(pose, cand_e, None, cand_s, None, e_xyz, e_mask,
                           s_xyz, s_mask)
        # keep the pose bounded near origin so shapes of work stay constant
        return Pose(q=p2.q, t=jnp.tanh(p2.t) * 1e-3)

    timeit_chained(rerank_step, pose0,
                   label="re-rank round (d2+select_k+fits+4 GN iters)")

    # sub-stages, chained through a query perturbation
    def chain_q(fn, q0, label, reduce_out):
        @jax.jit
        def step(q):
            out = fn(q)
            return q + jnp.tanh(reduce_out(out)) * 1e-7

        timeit_chained(step, q0, label=label)

    chain_q(lambda q: voxelmap.candidate_d2(cand_s, q), s_xyz,
            "surf candidate_d2", lambda o: jnp.sum(o))
    chain_q(lambda q: voxelmap.select_k_mask(
        voxelmap.candidate_d2(cand_s, q), 5), s_xyz,
        "surf d2+select_k_mask", lambda o: jnp.sum(o[0]))
    chain_q(lambda q: voxelmap.candidate_d2(cand_e, q), e_xyz,
            "edge candidate_d2", lambda o: jnp.sum(o))
    chain_q(lambda q: voxelmap.select_k_mask(
        voxelmap.candidate_d2(cand_e, q), 5), e_xyz,
        "edge d2+select_k_mask", lambda o: jnp.sum(o[0]))

    def surf_all(q):
        d2 = voxelmap.candidate_d2(cand_s, q)
        kth, win = voxelmap.select_k_mask(d2, 5)
        return residuals.surf_association_fused(
            q, q, cand_s, win, kth, 5, oc.nn_radius_sq, oc.plane_fit_tol)

    chain_q(surf_all, s_xyz, "surf d2+select+fit",
            lambda f: jnp.sum(f.offset))

    def edge_all(q):
        d2 = voxelmap.candidate_d2(cand_e, q)
        kth, win = voxelmap.select_k_mask(d2, 5)
        return residuals.edge_association_fused(
            q, q, cand_e, win, kth, 5, oc.nn_radius_sq,
            oc.edge_eig_ratio, oc.line_half_length)

    chain_q(edge_all, e_xyz, "edge d2+select+fit",
            lambda f: jnp.sum(f.pa))


if __name__ == "__main__":
    main()
