"""Capacity-overflow observability: a deliberately undersized config must
produce visible drop counters (OdomDiagnostics / pose_row / summary.json),
not silent ATE loss. Round-4 verdict item: every silent cap (scan feature
budgets, map hash-table insert) now counts what it sheds."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from floam_tpu import sim
from floam_tpu.config import FloamConfig, LidarConfig, OdomConfig
from floam_tpu.pipeline import Pipeline
from floam_tpu.ops import voxelmap


def _tiny_cfg(**odom_kw):
    kw = dict(map_resolution=0.2, scan_edge_capacity=1024,
              scan_surf_capacity=4096, map_edge_table=8192,
              map_surf_table=32768, max_outer_iters=4)
    kw.update(odom_kw)
    return FloamConfig(
        lidar=LidarConfig(num_lines=16, points_per_ring=1024,
                          min_distance=0.5, max_distance=30.0),
        odom=OdomConfig(**kw))


def _scans(cfg, n=3):
    world = sim.World.room(size=18.0, height=4.0, num_poles=14, seed=1)
    gt = sim.spiral_trajectory(n, step=0.12, yaw_rate=0.03)
    return [sim.simulate_scan(world, q, t, cfg.lidar, azimuth_steps=720,
                              seed=i) for i, (q, t) in enumerate(gt)]


def test_healthy_config_reports_no_map_loss():
    """A well-sized map table sheds nothing at insert. (Scan-budget
    truncation is the DESIGNED uniform decimation — counted, and nonzero
    on dense scans — so only map_insert must be zero here.)"""
    cfg = _tiny_cfg()
    pipe = Pipeline(cfg)
    for i, s in enumerate(_scans(cfg)):
        pipe.process(s, 0.1 * i)
    tot = pipe.drop_totals()
    assert tot["map_insert"] == 0
    assert tot["scan_edge"] == 0  # edge picks fit their budget here


def test_undersized_surf_budget_counts_drops():
    # surf budget far below the ~6k surf candidates a 720-step room scan
    # yields -> the compaction truncation must be counted per frame
    cfg = _tiny_cfg(scan_surf_capacity=256, scan_surf_slots=8192)
    pipe = Pipeline(cfg)
    for i, s in enumerate(_scans(cfg)):
        pipe.process(s, 0.1 * i)
    tot = pipe.drop_totals()
    assert tot["scan_surf"] > 0
    # the per-frame record carries the same counter
    drops = [f.dropped_points for f in pipe.frames]
    assert any(d[1] > 0 for d in drops[1:])


def test_insert_overflow_counter():
    """Direct voxelmap unit: a 1-bucket table with more distinct voxels
    than ways must report the overflow."""
    vm = voxelmap.empty(1, 0.5, jnp.float32, 2)  # 8 ways total
    n = 64
    xyz = jnp.asarray(np.random.default_rng(0).uniform(-8, 8, (n, 3)),
                      jnp.float32)
    mask = jnp.ones((n,), bool)
    vm2, dropped = voxelmap.insert(vm, xyz, mask, probe_rounds=2,
                                   return_dropped=True)
    assert int(dropped) > 0
    assert int(dropped) + int(vm2.num_occupied()) <= n
    # the non-counting call still returns just the map (API compat)
    vm3 = voxelmap.insert(vm, xyz, mask, probe_rounds=2)
    assert int(vm3.num_occupied()) == int(vm2.num_occupied())
