"""Experiment 4: break down B=8 map-update cost (insert/crop/pack) and
measure hash-downsample of scan features (reference downSamplingToMap
semantics) as a query-budget cut."""
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
from floam_tpu.ops import se3, voxelmap
from floam_tpu.pipeline import Pipeline, _features_from_scan
from floam_tpu.types import RingScan
import bench


def timeit(fn, *args, n=20, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:56s} {ms:8.3f} ms")
    return out


def main():
    cfg = FloamConfig.kitti_hdl64()
    oc = cfg.odom
    raw, gt = bench.get_scans(cfg)
    R, C = cfg.lidar.num_lines, cfg.lidar.points_per_ring
    scans = [RingScan(xyz=jnp.asarray(s["xyz"]),
                      intensity=jnp.zeros((R, C), jnp.float32),
                      time=jnp.asarray(s["time"]),
                      mask=jnp.asarray(s["mask"])) for s in raw]
    pipe = Pipeline(cfg, dtype=jnp.float32)
    for i, s in enumerate(scans):
        pipe.process(s, 0.1 * i)
    jax.block_until_ready(pipe.state.pose.t)
    state = pipe.state
    feat = jax.jit(functools.partial(_features_from_scan, cfg=cfg))
    edge, surf = feat(scans[-1])
    B = 8
    bstate = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), state)
    be = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), edge)
    bs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), surf)

    @jax.jit
    def insert_only(st, e, s):
        def one(st, e, s):
            ew = se3.quat_rotate(st.pose.q[None, :], e.xyz) + st.pose.t
            sw = se3.quat_rotate(st.pose.q[None, :], s.xyz) + st.pose.t
            em = voxelmap.insert(st.map.edge, ew, e.mask, oc.voxel_count_cap,
                                 probe_rounds=2)
            sm = voxelmap.insert(st.map.surf, sw, s.mask, oc.voxel_count_cap,
                                 probe_rounds=2)
            return em.counts.sum() + sm.counts.sum()
        return jax.vmap(one)(st, e, s)

    timeit(insert_only, bstate, be, bs, label="B=8 insert x2")

    @jax.jit
    def crop_only(st):
        def one(st):
            em = voxelmap.crop(st.map.edge, st.pose.t, oc.crop_radius)
            sm = voxelmap.crop(st.map.surf, st.pose.t, oc.crop_radius)
            return em.counts.sum() + sm.counts.sum()
        return jax.vmap(one)(st)

    timeit(crop_only, bstate, label="B=8 crop x2")

    @jax.jit
    def pack_only(st):
        def one(st):
            return voxelmap.pack_query_view(st.map.edge).sum() + \
                voxelmap.pack_query_view(st.map.surf).sum()
        return jax.vmap(one)(st)

    timeit(pack_only, bstate, label="B=8 pack x2")

    # hash-downsample the feature clouds (reference downSamplingToMap)
    @jax.jit
    def ds(e, s):
        def one(e, s):
            ex, em = voxelmap.hash_downsample(e.xyz, e.mask, oc.map_resolution,
                                              2048, 2048)
            sx, sm = voxelmap.hash_downsample(s.xyz, s.mask,
                                              2.0 * oc.map_resolution,
                                              4096, 4096)
            return ex, em, sx, sm
        return jax.vmap(one)(e, s)

    ex, em_, sx, sm_ = timeit(ds, be, bs, label="B=8 hash_downsample e+s")
    print("downsampled edge:", int(em_[0].sum()), "of", int(be.mask[0].sum()),
          " surf:", int(sm_[0].sum()), "of", int(bs.mask[0].sum()))

    @jax.jit
    def ds1(e, s):
        ex, em = voxelmap.hash_downsample(e.xyz, e.mask, oc.map_resolution,
                                          2048, 2048)
        sx, sm = voxelmap.hash_downsample(s.xyz, s.mask,
                                          2.0 * oc.map_resolution, 4096, 4096)
        return ex, em, sx, sm

    timeit(ds1, edge, surf, label="B=1 hash_downsample e+s")


if __name__ == "__main__":
    main()
