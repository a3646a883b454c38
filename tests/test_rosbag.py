"""ROS1 bag ingestion: format round trip, event stream, and end-to-end
consumption of the recorded VLP-16 fixture by the structor preset — the
reference's actual deployment input (PointXYZIRT clouds + IMU topic,
reference include/lidar.h:15-32, src/laserProcessingNode.cpp:201-204,
README.md:59-67)."""
from pathlib import Path

import numpy as np
import pytest

from floam_tpu.io.rosbag import (BagReader, BagWriter, RosbagSource,
                                 parse_imu, parse_pointcloud2, cloud_field)

FIXTURE = Path(__file__).parent / "data" / "structor_vlp16_mini.bag"


@pytest.mark.parametrize("compression", ["none", "bz2"])
def test_bag_roundtrip(tmp_path, rng, compression):
    path = tmp_path / "mini.bag"
    w = BagWriter(path, compression=compression)
    n = 500
    xyz = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    inten = rng.uniform(0, 100, n).astype(np.float32)
    ring = rng.integers(0, 16, n).astype(np.uint16)
    t = rng.uniform(0, 0.1, n).astype(np.float32)
    q = np.array([0.9, 0.1, 0.2, np.sqrt(1 - 0.9**2 - 0.05)])
    q /= np.linalg.norm(q)
    w.write_imu("/imu", 10.00, q, angular_velocity=(0.1, 0.2, 0.3))
    w.write_cloud_xyzirt("/points", 10.05, xyz, inten, ring, t)
    w.write_imu("/imu", 10.01, q)
    w.close()

    msgs = list(BagReader(path).messages())
    assert [m[0] for m in msgs] == ["/imu", "/points", "/imu"]
    assert msgs[1][1] == "sensor_msgs/PointCloud2"
    assert msgs[0][1] == "sensor_msgs/Imu"

    imu = parse_imu(msgs[0][3])
    np.testing.assert_allclose(imu["orientation_wxyz"], q, atol=1e-12)
    np.testing.assert_allclose(imu["angular_velocity"], [0.1, 0.2, 0.3])
    assert abs(imu["stamp"] - 10.00) < 1e-6

    pc = parse_pointcloud2(msgs[1][3])
    assert pc["width"] == n and pc["point_step"] == 32
    np.testing.assert_allclose(cloud_field(pc, "x"), xyz[:, 0])
    np.testing.assert_allclose(cloud_field(pc, "z"), xyz[:, 2])
    np.testing.assert_allclose(cloud_field(pc, "intensity"), inten)
    np.testing.assert_array_equal(cloud_field(pc, "ring"), ring)
    np.testing.assert_allclose(cloud_field(pc, "time"), t)


def test_rosbag_source_events(tmp_path, rng):
    w = BagWriter(tmp_path / "s.bag")
    xyz = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
    w.write_imu("/imu", 1.0, np.array([1.0, 0, 0, 0]))
    w.write_cloud_xyzirt("/pts", 1.05, xyz, np.ones(100, np.float32),
                         np.zeros(100, np.uint16),
                         np.zeros(100, np.float32))
    w.write_imu("/imu", 1.1, np.array([1.0, 0, 0, 0]))
    w.close()
    events = list(RosbagSource(tmp_path / "s.bag"))
    assert [e[0] for e in events] == ["imu", "scan", "imu"]
    kind, stamp, cloud = events[1]
    assert abs(stamp - 1.05) < 1e-6
    np.testing.assert_allclose(cloud["xyz"], xyz)
    assert cloud["ring"] is not None and cloud["time"] is not None


def test_fixture_committed():
    """The recorded fixture exists and parses: 6 XYZIRT scans + an IMU
    stream that covers them."""
    assert FIXTURE.exists(), "tests/data/structor_vlp16_mini.bag missing"
    scans, imu = 0, 0
    t_imu = []
    for kind, stamp, payload in RosbagSource(FIXTURE):
        if kind == "scan":
            scans += 1
            assert payload["ring"] is not None
            assert payload["time"] is not None
            assert payload["intensity"] is not None
            assert payload["ring"].max() == 15  # VLP-16
            assert 0 <= payload["time"].min() <= payload["time"].max() <= 0.1
        else:
            imu += 1
            t_imu.append(stamp)
    assert scans == 6
    assert imu > 50
    assert min(t_imu) < 100.0 and max(t_imu) > 100.0 + 5 * 0.1


@pytest.mark.slow
def test_structor_preset_consumes_bag(tmp_path):
    """End to end (VERDICT item 4 done-criterion): the structor_vlp16
    preset ingests the recorded bag — real ring/time fields drive ring
    bucketing and the IMU stream drives rotational deskew — and produces
    a sane trajectory: a ~0.6 rad/s yaw arc at 1 m/s over 0.6 s."""
    import dataclasses

    import jax.numpy as jnp

    from floam_tpu.config import FloamConfig
    from floam_tpu.runner import run_rosbag_sequence

    cfg = FloamConfig.structor_vlp16()
    # shrink capacities for test speed (same code path)
    cfg = dataclasses.replace(
        cfg, lidar=dataclasses.replace(cfg.lidar, points_per_ring=512))
    res = run_rosbag_sequence(FIXTURE, cfg=cfg,
                              output_dir=tmp_path / "out",
                              progress_every=0)
    assert len(res.stamps) == 6
    # ground truth from the fixture generator: arc of radius v/w
    import numpy as np

    r = 1.0 / 0.6
    t_end = 5 * 0.1
    yaw = 0.6 * t_end
    gt_end = np.array([r * np.sin(yaw), r * (1 - np.cos(yaw)), 0.0])
    err = np.linalg.norm(res.trans[-1] - gt_end)
    assert err < 0.08, f"trajectory end {res.trans[-1]} vs {gt_end}"
    assert (tmp_path / "out" / "trajectory_tum.txt").exists()
