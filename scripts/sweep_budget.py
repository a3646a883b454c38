"""Query-budget sweep: the BA ablation exposed that QUARTER association
budgets (512 edge / 1024 surf) beat the shipped 2048/4096 on longrun
accuracy. Validate across capacities and noise, with solo rates.

Usage: python scripts/sweep_budget.py [--frames 240]
"""
import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=240)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))

    from floam_tpu.config import FloamConfig
    from longrun_sim import run_longrun

    base = FloamConfig.kitti_hdl64()
    caps = [(512, 1024), (1024, 2048), (2048, 4096), (1024, 4096),
            (512, 2048)]
    rows = []
    for noise in (0.02, 0.08):
        for ec, sc in caps:
            cfg = dataclasses.replace(
                base, odom=dataclasses.replace(
                    base.odom, scan_edge_capacity=ec,
                    scan_surf_capacity=sc))
            r = run_longrun(frames=args.frames, noise=noise, workers=8,
                            cfg=cfg, ba=False)
            row = dict(noise=noise, edge=ec, surf=sc, **r)
            rows.append(row)
            print(f"noise={noise} caps={ec}/{sc}: "
                  f"ate={r['longrun_ate_m']} drift={r['longrun_drift_pct']}%"
                  f" rate={r['longrun_rate']} "
                  f"steady={r['longrun_rate_steady']}", flush=True)
    out = Path(__file__).parent.parent / "docs" / "budget_sweep.jsonl"
    out.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
