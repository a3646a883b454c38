"""Final validation for the (512, 4096) default caps: single rate/ATE,
batch-8 rate, and deskew-vs-control on skewed scans."""
import dataclasses
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

    base = FloamConfig.kitti_hdl64()
    cfg = dataclasses.replace(
        base, odom=dataclasses.replace(base.odom, scan_edge_capacity=512,
                                       scan_surf_capacity=4096))
    raw, gt_t, _ = bench.get_scans(base)
    raw_skew, gt_skew, _ = bench.get_scans(base, skew=True)

    def upload(rs):
        return [RingScan(xyz=jnp.asarray(s["xyz"]),
                         intensity=jnp.asarray(s["intensity"]),
                         time=jnp.asarray(s["time"]),
                         mask=jnp.asarray(s["mask"])) for s in rs]

    scans, skew_scans = upload(raw), upload(raw_skew)
    rate, ate = bench.bench_single(cfg, scans, gt_t)
    print(json.dumps(dict(which="single", rate=round(rate, 1),
                          ate=round(ate, 4))), flush=True)
    brate = bench.bench_batched(cfg, scans, batch=8)
    print(json.dumps(dict(which="batch8", rate=round(brate, 1))), flush=True)
    vrate, vate = bench.bench_single(cfg, skew_scans, gt_skew)
    print(json.dumps(dict(which="skew_control", rate=round(vrate, 1),
                          ate=round(vate, 4))), flush=True)
    cfg_d = dataclasses.replace(
        cfg, odom=dataclasses.replace(cfg.odom, deskew=True))
    drate, date = bench.bench_single(cfg_d, skew_scans, gt_skew)
    print(json.dumps(dict(which="skew_deskew", rate=round(drate, 1),
                          ate=round(date, 4))), flush=True)


if __name__ == "__main__":
    main()
