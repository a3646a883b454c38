"""True multi-process (DCN-style) tests: two OS processes, each owning 4
CPU devices, joined with jax.distributed (gloo) into one 8-device runtime.

This is the host-boundary analogue the reference has none of (its only
inter-process transport is ROS TCPROS pub/sub between the three nodes,
CMakeLists.txt:58-67); here the cross-host substrate is XLA collectives
over the distributed runtime:

  * dp-sharded odometry — each process advances its own sequences, no
    cross-host traffic (embarrassingly parallel throughput tier);
  * hierarchical map-sharded odometry — map planes sharded over the
    intra-process ("mp") axis, queries sliced over the process ("host")
    axis, 6x6 normal equations psum'd across hosts;
  * factor-sharded windowed BA — 6Kx6K normal equations psum'd across
    hosts.

Every process recomputes the single-device reference locally from the
same seed and asserts the distributed result matches, so a silent
cross-process divergence fails loudly in the worker.
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent

WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["FLOAM_ROOT"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["FLOAM_COORD"],
    num_processes=2, process_id=int(os.environ["FLOAM_PID"]))
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

assert len(jax.devices()) == 8, jax.devices()
assert len(jax.local_devices()) == 4

from floam_tpu import odometry
from floam_tpu.config import (FeatureConfig, FloamConfig, LidarConfig,
                              OdomConfig)
from floam_tpu.ops import residuals as R
from floam_tpu.parallel import make_sharded_odom_step
from floam_tpu.parallel.batch import batched_init_state
from floam_tpu.parallel.sharded_map import make_map_sharded_step, shard_state
from floam_tpu.types import PointBatch

cfg = FloamConfig(
    lidar=LidarConfig(num_lines=8, points_per_ring=256),
    features=FeatureConfig(min_ring_points=32),
    odom=OdomConfig(map_resolution=0.2, scan_edge_capacity=256,
                    scan_surf_capacity=1024, map_edge_table=1024,
                    map_surf_table=2048, max_outer_iters=3,
                    min_outer_iters=2),
)
rng = np.random.default_rng(0)


def batch(n, B=None):
    shape = (n, 3) if B is None else (B, n, 3)
    xyz = jnp.asarray(rng.uniform(-5, 5, shape), jnp.float32)
    return PointBatch(xyz=xyz, mask=jnp.ones(xyz.shape[:-1], bool))


def put(tree, mesh, spec_fn):
    def one(x):
        s = NamedSharding(mesh, spec_fn(x))
        return jax.make_array_from_callback(
            x.shape, s, lambda idx: np.asarray(x)[idx])
    return jax.tree_util.tree_map(one, tree)


# ---- 1. dp-sharded odometry over both processes --------------------------
mesh_dp = Mesh(np.array(jax.devices()).reshape(8), ("dp",))
B = 8
states = batched_init_state(cfg, B, dtype=jnp.float32)
edges, surfs = batch(256, B), batch(1024, B)
states = jax.vmap(
    lambda st, e, s: odometry.init_map_impl(st, e, s, cfg)
)(states, edges, surfs)

# single-device reference for lane 0, computed locally in every process
st0 = jax.tree_util.tree_map(lambda x: x[0], states)
e0 = jax.tree_util.tree_map(lambda x: x[0], edges)
s0 = jax.tree_util.tree_map(lambda x: x[0], surfs)
ref_state, _ = odometry.odom_step_impl(st0, e0, s0, cfg)
ref_t = np.asarray(ref_state.pose.t)

lead = lambda x: P(*(("dp",) + (None,) * (x.ndim - 1)))
states = put(states, mesh_dp, lead)
edges = put(edges, mesh_dp, lead)
surfs = put(surfs, mesh_dp, lead)
step = make_sharded_odom_step(mesh_dp, cfg)
out, diag = step(states, edges, surfs)
jax.block_until_ready(out.pose.t)
# lane 0 lives on process 0; compare through an allgathered copy
from jax.experimental import multihost_utils
t_all = multihost_utils.process_allgather(out.pose.t, tiled=True)
t_all = np.asarray(t_all).reshape(-1, 3)[:B]
np.testing.assert_allclose(t_all[0], ref_t, atol=1e-6)
assert np.isfinite(t_all).all()
print("dp odometry over 2 processes OK", flush=True)

# ---- 2. hierarchical map-sharded odometry (host x mp) --------------------
mesh_h = Mesh(np.array(jax.devices()).reshape(2, 4), ("host", "mp"))
e1, s1 = batch(256), batch(1024)
stc = odometry.init_state(cfg, jnp.float32)
stc = odometry.init_map_impl(stc, e1, s1, cfg)
ref2, _ = odometry.odom_step_impl(stc, e1, s1, cfg)
ref2_t = np.asarray(ref2.pose.t)

stc = odometry.init_state(cfg, jnp.float32)
stc = odometry.init_map_impl(stc, e1, s1, cfg)
from floam_tpu.parallel.sharded_map import _state_spec
sspec = _state_spec("mp", cfg)
stc = jax.tree_util.tree_map(
    lambda x, sp: jax.make_array_from_callback(
        x.shape, NamedSharding(mesh_h, sp), lambda idx: np.asarray(x)[idx]),
    stc, sspec)
e1g = put(e1, mesh_h, lambda x: P())
s1g = put(s1, mesh_h, lambda x: P())
hstep = make_map_sharded_step(mesh_h, cfg, axis="mp", query_axis="host")
out2, diag2 = hstep(stc, e1g, s1g)
jax.block_until_ready(out2.pose.t)
# fully-replicated output: addressable everywhere, read directly
t2 = np.asarray(out2.pose.t)
np.testing.assert_allclose(t2, ref2_t, atol=1e-6)
print("hierarchical map-sharded odometry over 2 processes OK", flush=True)

# ---- 3. factor-sharded windowed BA psum'd across hosts -------------------
from floam_tpu.parallel import BAProblem, ba_refine, make_sharded_ba_step

K, Ne, Ns = 4, 64, 128
quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (K, 1))
trans = jnp.asarray(np.cumsum(rng.normal(0, 0.1, (K, 3)), 0), jnp.float32)
nrm = rng.normal(size=(K, Ns, 3))
nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
prob = BAProblem(
    quats=quats, trans=trans,
    edge=R.EdgeFactors(
        point=jnp.asarray(rng.normal(0, 2, (K, Ne, 3)), jnp.float32),
        pa=jnp.asarray(rng.normal(0, 2, (K, Ne, 3)), jnp.float32),
        pb=jnp.asarray(rng.normal(0, 2, (K, Ne, 3)), jnp.float32),
        valid=jnp.ones((K, Ne), bool)),
    surf=R.SurfFactors(
        point=jnp.asarray(rng.normal(0, 2, (K, Ns, 3)), jnp.float32),
        normal=jnp.asarray(nrm, jnp.float32),
        offset=jnp.asarray(rng.normal(0, 1, (K, Ns)), jnp.float32),
        valid=jnp.ones((K, Ns), bool)),
    prior_dq=jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (K - 1, 1)),
    prior_dt=jnp.zeros((K - 1, 3), jnp.float32),
    prior_weight=jnp.asarray(1.0, jnp.float32),
)
ref_ba = ba_refine(prob, cfg.odom, iters=2)
mesh_ba = Mesh(np.array(jax.devices()).reshape(8), ("dp",))
fspec = P(None, "dp")
espec = R.EdgeFactors(point=fspec, pa=fspec, pb=fspec, valid=fspec)
sspec2 = R.SurfFactors(point=fspec, normal=fspec, offset=fspec, valid=fspec)
pspec = BAProblem(quats=P(), trans=P(), edge=espec, surf=sspec2,
                  prior_dq=P(), prior_dt=P(), prior_weight=P())
prob_g = jax.tree_util.tree_map(
    lambda x, sp: jax.make_array_from_callback(
        x.shape, NamedSharding(mesh_ba, sp), lambda idx: np.asarray(x)[idx]),
    prob, pspec)
ba = make_sharded_ba_step(mesh_ba, cfg.odom, iters=2)
q_out, t_out = ba(prob_g)
jax.block_until_ready(t_out)
t_ba = np.asarray(
    multihost_utils.process_allgather(t_out, tiled=True)).reshape(-1, 3)
np.testing.assert_allclose(t_ba[:K], np.asarray(ref_ba.trans), atol=1e-4)
print("distributed BA over 2 processes OK", flush=True)
jax.distributed.shutdown()
print("MULTIPROCESS_OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_collectives(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()
    env = dict(os.environ)
    env.update({
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "FLOAM_ROOT": str(ROOT),
        "FLOAM_COORD": f"localhost:{port}",
        "JAX_PLATFORMS": "cpu",
    })
    procs = []
    for pid in range(2):
        e = dict(env)
        e["FLOAM_PID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=e,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "MULTIPROCESS_OK" in out, out
