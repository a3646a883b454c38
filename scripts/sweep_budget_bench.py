"""Validate the edge-capacity finding on the BENCH workload (room spiral,
1800-azimuth, ~115k pts/scan) + the skewed set: ATE and steady rate per
(edge, surf) capacity. Run AFTER budget_sweep (longrun) — this guards the
preset-default change. Usage: python scripts/sweep_budget_bench.py"""
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
    raw, gt_t, _ = bench.get_scans(base)
    raw_skew, gt_skew, _ = bench.get_scans(base, skew=True)

    def upload(rs):
        return [RingScan(xyz=jnp.asarray(s["xyz"]),
                         intensity=jnp.asarray(s["intensity"]),
                         time=jnp.asarray(s["time"]),
                         mask=jnp.asarray(s["mask"])) for s in rs]

    scans, skew_scans = upload(raw), upload(raw_skew)
    rows = []
    for ec, sc in [(2048, 4096), (512, 4096), (512, 2048), (1024, 4096)]:
        cfg = dataclasses.replace(
            base, odom=dataclasses.replace(base.odom,
                                           scan_edge_capacity=ec,
                                           scan_surf_capacity=sc))
        rate, ate = bench.bench_single(cfg, scans, gt_t)
        cfg_d = dataclasses.replace(
            cfg, odom=dataclasses.replace(cfg.odom, deskew=True))
        drate, date = bench.bench_single(cfg_d, skew_scans, gt_skew)
        row = dict(edge=ec, surf=sc, rate=round(rate, 1),
                   ate=round(ate, 4), deskew_rate=round(drate, 1),
                   deskew_ate=round(date, 4))
        rows.append(row)
        print(json.dumps(row), flush=True)
    out = Path(__file__).parent.parent / "docs" / "budget_sweep_bench.jsonl"
    out.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


if __name__ == "__main__":
    main()
