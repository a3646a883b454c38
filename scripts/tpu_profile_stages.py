"""Per-stage timing of the scan pipeline on the real TPU."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from floam_tpu import odometry, sim  # noqa: E402
from floam_tpu.config import FloamConfig  # noqa: E402
from floam_tpu.ops import features, knn, voxel, residuals, gauss_newton as gn  # noqa: E402
from floam_tpu.ops import se3  # noqa: E402
from floam_tpu.types import RingScan  # noqa: E402


def timeit(name, fn, *args, n=10, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:40s} {dt:8.2f} ms", flush=True)
    return out


cfg = FloamConfig.kitti_hdl64()
oc = cfg.odom
rng = np.random.default_rng(0)

# dispatch overhead
f_triv = jax.jit(lambda x: x + 1)
x = jnp.zeros((8,), jnp.float32)
timeit("trivial dispatch", f_triv, x, n=50)

# synthetic scan-like data
R, C = cfg.lidar.num_lines, cfg.lidar.points_per_ring
xyz = rng.uniform(-40, 40, (R, C, 3)).astype(np.float32)
mask = rng.random((R, C)) < 0.78
scan = RingScan(xyz=jnp.asarray(xyz), intensity=jnp.zeros((R, C), jnp.float32),
                time=jnp.zeros((R, C), jnp.float32), mask=jnp.asarray(mask))

feat = jax.jit(lambda s: features.extract_features(s, cfg.features))
timeit("feature extraction", feat, scan)

flat = jnp.asarray(xyz.reshape(-1, 3))
fmask = jnp.asarray(mask.reshape(-1))
ds_e = jax.jit(lambda x, m: voxel.voxel_downsample(x, m, 0.4, oc.scan_edge_capacity))
ds_s = jax.jit(lambda x, m: voxel.voxel_downsample(x, m, 0.8, oc.scan_surf_capacity))
timeit("voxel downsample 147k->4k", ds_e, flat, fmask)
timeit("voxel downsample 147k->16k", ds_s, flat, fmask)

# map grids at realistic sizes
map_edge = rng.uniform(-50, 50, (oc.map_edge_capacity, 3)).astype(np.float32)
map_surf = rng.uniform(-50, 50, (oc.map_surf_capacity, 3)).astype(np.float32)
bg = jax.jit(lambda x: knn.build_grid(x, jnp.ones(len(x), bool), 1.0))
grid_e = timeit("build_grid edge 64k", bg, jnp.asarray(map_edge))
grid_s = timeit("build_grid surf 128k", bg, jnp.asarray(map_surf))

qe = jnp.asarray(rng.uniform(-50, 50, (oc.scan_edge_capacity, 3)).astype(np.float32))
qs = jnp.asarray(rng.uniform(-50, 50, (oc.scan_surf_capacity, 3)).astype(np.float32))
qk = jax.jit(lambda g, q: knn.query_knn(g, q, jnp.ones(len(q), bool), k=5,
                                        cell_capacity=oc.grid_cell_capacity))
nn_e = timeit("query_knn edge 4k queries", qk, grid_e, qe)
nn_s = timeit("query_knn surf 16k queries", qk, grid_s, qs)

assoc_e = jax.jit(lambda q, nx, nd: residuals.edge_association(
    q, nx, nd, oc.nn_radius_sq, oc.edge_eig_ratio, oc.line_half_length))
assoc_s = jax.jit(lambda q, nx, nd: residuals.surf_association(
    q, nx, nd, oc.nn_radius_sq, oc.plane_fit_tol))
ef = timeit("edge association", assoc_e, qe, nn_e[0], nn_e[1])
sf = timeit("surf association", assoc_s, qs, nn_s[0], nn_s[1])

from floam_tpu.types import Pose
pose = Pose.identity(jnp.float32)
solve = jax.jit(lambda p, e, s: gn.solve_pose(p, e, s, oc))
timeit("GN solve (4 inner iters)", solve, pose, ef, sf)

# full merge_into_map (keyframe map update path)
merge = jax.jit(lambda g, nx, nm, p: odometry._merge_into_map(
    g, nx, nm, p, oc, leaf=0.8, crop=True))
timeit("map merge+revoxel+rebuild surf", merge, grid_s, qs,
       jnp.ones(len(qs), bool), pose)
