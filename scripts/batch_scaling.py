"""Batch-width scaling on one chip: if the program is serial-chain-bound
(docs/PERFORMANCE.md roofline), widening the batch should amortize kernel
launch overhead until compute saturates. Measures aggregate scans/s for
batch in {1, 8, 16, 32}."""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))
    import jax.numpy as jnp

    import bench
    from floam_tpu.config import FloamConfig
    from floam_tpu.types import RingScan

    cfg = FloamConfig.kitti_hdl64()
    raw, gt_t, _ = bench.get_scans(cfg)
    scans = [RingScan(xyz=jnp.asarray(s["xyz"]),
                      intensity=jnp.asarray(s["intensity"]),
                      time=jnp.asarray(s["time"]),
                      mask=jnp.asarray(s["mask"])) for s in raw]
    rate1, _ = bench.bench_single(cfg, scans, gt_t)
    print(json.dumps(dict(batch=1, aggregate=round(rate1, 1))), flush=True)
    for b in (8, 16, 32):
        rate = bench.bench_batched(cfg, scans, batch=b)
        print(json.dumps(dict(batch=b, aggregate=round(rate, 1),
                              per_lane_ms=round(b / rate * 1e3, 2))),
              flush=True)


if __name__ == "__main__":
    main()
