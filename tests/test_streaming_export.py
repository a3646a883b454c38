"""Streamed cloud exports: disk spool, incremental voxel downsample,
streaming PCD writer, and intensity carried end to end (XYZI).

The reference exports XYZI everywhere (VelToIntensityCopy,
src/odomEstimationClass.cpp:308-318; src/utils.cpp:66-77) but holds every
cloud in RAM until exit (Dump, odomEstimationNode.cpp:284-287); here the
same artifact set streams through an on-disk spool with O(one scan) RSS.
"""
import numpy as np
import pytest

from floam_tpu.io.pcd import StreamingPcdWriter, read_pcd
from floam_tpu.io.spool import CloudSpool
from floam_tpu.ops.voxel import StreamingVoxelDownsample, voxel_downsample_np


def test_spool_roundtrip(tmp_path, rng):
    path = tmp_path / "clouds.spool"
    sp = CloudSpool(path, mode="w")
    clouds = [rng.normal(size=(n, 4)).astype(np.float32)
              for n in (10, 0, 37, 5)]
    for c in clouds:
        sp.append(c)
    assert len(sp) == 4
    for c, back in zip(clouds, sp):
        np.testing.assert_array_equal(c, back)
    np.testing.assert_array_equal(sp[2], clouds[2])
    np.testing.assert_array_equal(sp[-1], clouds[-1])
    sp.close()

    rd = CloudSpool(path, mode="r")
    assert len(rd) == 4
    np.testing.assert_array_equal(rd[1], clouds[1])
    np.testing.assert_array_equal(rd[3], clouds[3])
    rd.close()


def test_spool_concurrent_append_read(tmp_path, rng):
    """Records are readable while another thread appends (the pipeline's
    fetch thread writes while exporters may already inspect)."""
    import threading

    sp = CloudSpool(tmp_path / "c.spool", mode="w")
    clouds = [rng.normal(size=(8, 4)).astype(np.float32) for _ in range(50)]

    def writer():
        for c in clouds:
            sp.append(c)

    t = threading.Thread(target=writer)
    t.start()
    seen = 0
    while seen < len(clouds):
        n = len(sp)
        for i in range(seen, n):
            np.testing.assert_array_equal(sp[i], clouds[i])
        seen = n
    t.join()
    sp.close()


def test_streaming_pcd_writer(tmp_path, rng):
    path = tmp_path / "out.pcd"
    w = StreamingPcdWriter(path, has_intensity=True)
    parts = [rng.normal(size=(n, 3)).astype(np.float32) for n in (7, 0, 21)]
    intens = [rng.uniform(0, 1, len(p)).astype(np.float32) for p in parts]
    for p, i in zip(parts, intens):
        w.append(p, i)
    w.close()
    xyz, inten = read_pcd(path)
    np.testing.assert_allclose(xyz, np.concatenate(parts), rtol=1e-6)
    np.testing.assert_allclose(inten, np.concatenate(intens), rtol=1e-6)


def test_streaming_voxel_matches_batch(rng):
    pts = rng.uniform(-8, 8, (5000, 3)).astype(np.float32)
    acc = StreamingVoxelDownsample(0.5)
    for chunk in np.array_split(pts, 7):
        acc.add(chunk)
    got = acc.centroids()
    want = voxel_downsample_np(pts, 0.5)
    # same voxel set, same centroids (order may differ)
    assert len(got) == len(want)
    np.testing.assert_allclose(np.sort(got, axis=0), np.sort(want, axis=0),
                               atol=1e-4)


@pytest.mark.slow
def test_runner_exports_carry_intensity(tmp_path):
    """End to end: simulated nonzero intensity must reach the exported
    XYZI PCDs (save_odom / balm / posegraph / merged) via the spool."""
    import dataclasses

    import jax.numpy as jnp

    from floam_tpu import sim
    from floam_tpu.config import ExportConfig
    from floam_tpu.runner import SequenceRunner
    from test_odometry import small_config

    cfg = dataclasses.replace(
        small_config(),
        export=ExportConfig(save_merged=True, save_balm=True,
                            save_posegraph=False, save_odom=True))
    world = sim.World.room(size=18.0, height=4.0, num_poles=10, seed=2)
    gt = sim.spiral_trajectory(5, step=0.12)

    def gen():
        for i, (q, t) in enumerate(gt):
            yield i * 0.1, sim.simulate_scan(world, q, t, cfg.lidar,
                                             azimuth_steps=720, seed=i)

    out = tmp_path / "out"
    runner = SequenceRunner(cfg, dtype=jnp.float64, output_dir=out)
    runner.run(gen())
    # clouds streamed through the on-disk spool, not host RAM
    assert (out / "clouds.spool").exists()
    assert runner.pipe.clouds is None
    sp = CloudSpool(out / "clouds.spool", mode="r")
    assert len(sp) == 5
    assert all(c.shape[1] == 4 for c in sp)
    sp.close()
    for pcd in [out / "balm" / "full0.pcd",
                next(iter((out / "odom").glob("*.pcd"))),
                out / "floam_merged.pcd"]:
        xyz, inten = read_pcd(pcd)
        assert inten is not None, f"{pcd} lost the intensity channel"
        assert len(inten) > 50 and float(np.abs(inten).max()) > 0.05
