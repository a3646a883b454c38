"""Full-SLAM product path: SequenceRunner with the global map enabled must
work on EVERY streaming wire format — the round-4 verdict reproduced a
crash (`AttributeError: 'tuple' object has no attribute 'xyz'`) when
with_global_map=True met the quantized q16 chunked stream. This is the
reference's third executable (laserMappingNode.cpp:52-101) integrated with
the fast streaming loop."""
import numpy as np
import pytest

from floam_tpu import sim
from floam_tpu.io.pcd import read_pcd
from floam_tpu.runner import SequenceRunner, chunked_device_stream
from floam_tpu.types import RingScan

from test_odometry import small_config

N_FRAMES = 6


def _raw_frames(cfg):
    world = sim.World.room(size=18.0, height=4.0, num_poles=14, seed=1)
    gt = sim.spiral_trajectory(N_FRAMES, step=0.12, yaw_rate=0.03)
    out = []
    for i, (q, t) in enumerate(gt):
        d = sim.simulate_scan_np(world, q, t, cfg.lidar, azimuth_steps=360,
                                 seed=i)
        out.append(d)
    return out


def _run_with_map(tmp_path, stream_fn, tag):
    cfg = small_config()
    out = tmp_path / tag
    runner = SequenceRunner(cfg, with_global_map=True, output_dir=out)
    res = runner.run(stream_fn(cfg))
    assert len(res.stamps) == N_FRAMES
    # the map consumed at least the first keyframe and exported a PCD
    assert runner.global_map.num_points > 0
    xyz, inten = read_pcd(out / "map.pcd")
    assert len(xyz) == runner.global_map.num_points
    assert np.isfinite(xyz).all()
    return runner


def test_global_map_on_q16_chunked_stream(tmp_path):
    """The exact round-4 crash repro: q16 wire tuples through
    chunked_device_stream with with_global_map=True."""
    def stream(cfg):
        raw = _raw_frames(cfg)

        def host():
            for i, d in enumerate(raw):
                yield 0.1 * i, RingScan.pack_host_q16(
                    d["xyz"], d["time"], d["mask"], d["intensity"],
                    cols=512, range_m=cfg.lidar.max_distance)

        return chunked_device_stream(host(), chunk=3)

    runner = _run_with_map(tmp_path, stream, "q16")
    # feed ran on the worker thread and drained fully
    assert runner._map_queue is not None
    assert runner._map_queue.unfinished_tasks == 0


@pytest.mark.slow
def test_global_map_on_packed_plane_stream(tmp_path):
    def stream(cfg):
        raw = _raw_frames(cfg)
        for i, d in enumerate(raw):
            yield 0.1 * i, RingScan.pack_host(
                d["xyz"], d["time"], d["mask"], d["intensity"])

    _run_with_map(tmp_path, stream, "packed")


@pytest.mark.slow
def test_global_map_on_ringscan_stream(tmp_path):
    def stream(cfg):
        raw = _raw_frames(cfg)
        for i, d in enumerate(raw):
            yield 0.1 * i, RingScan.from_host(
                d["xyz"], d["time"], d["mask"], d["intensity"])

    _run_with_map(tmp_path, stream, "ringscan")


def test_scan_host_cloud_q16_matches_ringscan():
    """The host-side wire decode used by the map feed agrees with the
    device decode to quantization precision."""
    cfg = small_config()
    d = _raw_frames(cfg)[0]
    wire = RingScan.pack_host_q16(d["xyz"], d["time"], d["mask"],
                                  d["intensity"], cols=512,
                                  range_m=cfg.lidar.max_distance)
    xyz, mask, inten = SequenceRunner._scan_host_cloud(wire)
    scan = RingScan.from_packed_q16(*[np.asarray(w) for w in wire],
                                    capacity=cfg.lidar.points_per_ring)
    np.testing.assert_array_equal(
        np.asarray(scan.mask).reshape(-1).sum(), mask.sum())
    dev_xyz = np.asarray(scan.xyz).reshape(-1, 3)
    dev_mask = np.asarray(scan.mask).reshape(-1)
    np.testing.assert_allclose(xyz[mask], dev_xyz[dev_mask], atol=1e-5)
