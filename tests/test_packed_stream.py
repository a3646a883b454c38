"""Streaming wire formats: packed f32 planes and the quantized q16
format (the host->device link is the product loop's bottleneck on slow
transports — docs/PERFORMANCE.md), plus chunked device streaming."""
import jax.numpy as jnp
import numpy as np
import pytest

from floam_tpu import sim
from floam_tpu.runner import chunked_device_stream
from floam_tpu.types import RingScan

from test_odometry import small_config


def _sim_scan(cfg, seed=0):
    world = sim.World.room(size=18.0, height=4.0, num_poles=10, seed=1)
    gt = sim.spiral_trajectory(4, step=0.12)
    q, t = gt[seed % len(gt)]
    return sim.simulate_scan(world, q, t, cfg.lidar, azimuth_steps=360,
                             seed=seed)


def test_q16_roundtrip(rng):
    cfg = small_config()
    s = _sim_scan(cfg)
    xyz, tm, mask, inten = (np.asarray(s.xyz), np.asarray(s.time),
                            np.asarray(s.mask), np.asarray(s.intensity))
    data, counts, meta = RingScan.pack_host_q16(xyz, tm, mask, inten)
    assert data.dtype == np.uint16
    back = RingScan.from_packed_q16(jnp.asarray(data), jnp.asarray(counts),
                                    jnp.asarray(meta),
                                    capacity=cfg.lidar.points_per_ring)
    m = np.asarray(back.mask)
    np.testing.assert_array_equal(m, mask)
    np.testing.assert_allclose(np.asarray(back.xyz)[m], xyz[m],
                               atol=float(meta[0]) / 2 + 1e-6)
    np.testing.assert_allclose(np.asarray(back.time)[m], tm[m],
                               atol=RingScan.Q16_TIME_SPAN / 65535 + 1e-6)
    np.testing.assert_allclose(np.asarray(back.intensity)[m], inten[m],
                               atol=RingScan.Q16_INTEN_SPAN / 65535 + 1e-5)


def test_packed_roundtrip(rng):
    cfg = small_config()
    s = _sim_scan(cfg)
    p = RingScan.pack_host(np.asarray(s.xyz), np.asarray(s.time),
                           np.asarray(s.mask), np.asarray(s.intensity))
    back = RingScan.from_packed(jnp.asarray(p))
    np.testing.assert_array_equal(np.asarray(back.mask), np.asarray(s.mask))
    np.testing.assert_allclose(np.asarray(back.xyz), np.asarray(s.xyz),
                               atol=1e-6)


@pytest.mark.slow
def test_pipeline_q16_stream_matches_ringscan():
    """The quantized streaming path must track the full-precision path to
    quantization noise (5 mm points -> sub-cm pose agreement)."""
    import dataclasses

    from floam_tpu.pipeline import Pipeline

    cfg = small_config()
    cfg = dataclasses.replace(
        cfg, ba=dataclasses.replace(cfg.ba, enabled=False))
    scans = [_sim_scan(cfg, seed=i) for i in range(4)]

    pipe_a = Pipeline(cfg, dtype=jnp.float64)
    for i, s in enumerate(scans):
        pipe_a.process(s, 0.1 * i)
    _, qa, ta = pipe_a.trajectory()

    def host_stream():
        for i, s in enumerate(scans):
            yield 0.1 * i, RingScan.pack_host_q16(
                np.asarray(s.xyz), np.asarray(s.time), np.asarray(s.mask),
                np.asarray(s.intensity), cols=512)

    pipe_b = Pipeline(cfg, dtype=jnp.float64)
    for stamp, item in chunked_device_stream(host_stream(), chunk=2):
        pipe_b.process(item, stamp)
    _, qb, tb = pipe_b.trajectory()
    np.testing.assert_allclose(tb, ta, atol=0.01)
    np.testing.assert_allclose(qb, qa, atol=0.01)


def test_chunked_stream_remainder(rng):
    """Chunker flushes the non-full tail and preserves order/stamps."""
    items = [(0.1 * i, rng.normal(size=(2, 4, 5)).astype(np.float32))
             for i in range(5)]
    out = list(chunked_device_stream(iter(items), chunk=2))
    assert [s for s, _ in out] == [s for s, _ in items]
    for (_, orig), (_, dev) in zip(items, out):
        np.testing.assert_allclose(np.asarray(dev), orig)
