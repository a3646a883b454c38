"""Windowed-BA ablation on the 240-frame longrun circuit (VERDICT item 5):
does BA earn its device cost, and at which (window, every, iters, budgets)?

Axes:
  * noise: clean-ish (0.02) and stressed (0.08) range noise;
  * a DEGRADED odometry config (quarter association budgets) where the
    front-end leaves real error on the table for BA to recover;
  * BA cadence/iteration/budget variants, including cheaper-than-default
    settings that fit the >=100 scans/s product budget.

Usage: python scripts/ablate_ba.py [--frames 240] [--quick]
Writes results JSONL to docs/ba_ablation.jsonl and prints a table.
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
    ap.add_argument("--noise", type=float, nargs="*", default=[0.02, 0.08])
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))

    from floam_tpu.config import FloamConfig
    from longrun_sim import run_longrun

    variants = [
        ("off", dict(ba=False)),
        ("w8_e4_i4_1024/2048 (default)", dict(ba_overrides={})),
        ("w8_e8_i4_1024/2048", dict(ba_overrides=dict(every=8))),
        ("w8_e4_i2_512/1024", dict(ba_overrides=dict(
            iters=2, edge_budget=512, surf_budget=1024))),
        ("w16_e8_i4_1024/2048", dict(ba_overrides=dict(window=16, every=8))),
        ("w8_e4_i4_2048/4096_pw10", dict(ba_overrides=dict(
            edge_budget=2048, surf_budget=4096, prior_weight=10.0))),
    ]
    if args.quick:
        variants = variants[:3]

    odom_cfgs = [("full", None)]
    base = FloamConfig.kitti_hdl64()
    degraded = dataclasses.replace(
        base, odom=dataclasses.replace(
            base.odom, scan_edge_capacity=512, scan_surf_capacity=1024))
    odom_cfgs.append(("degraded", degraded))

    out_path = Path(__file__).parent.parent / "docs" / "ba_ablation.jsonl"
    rows = []
    with open(out_path, "w") as f:
        for noise in args.noise:
            for oc_name, cfg in odom_cfgs:
                for name, kw in variants:
                    r = run_longrun(frames=args.frames, noise=noise,
                                    workers=8, cfg=cfg,
                                    ba=kw.get("ba", True),
                                    ba_overrides=kw.get("ba_overrides"))
                    row = dict(noise=noise, odom=oc_name, variant=name, **r)
                    rows.append(row)
                    f.write(json.dumps(row) + "\n")
                    f.flush()
                    print(f"noise={noise} odom={oc_name:9s} {name:32s} "
                          f"ate={r['longrun_ate_m']} "
                          f"odom_ate={r['longrun_ate_odom_m']} "
                          f"drift={r['longrun_drift_pct']}% "
                          f"rate={r['longrun_rate']}", flush=True)
    print(f"\nwrote {len(rows)} rows to {out_path}", flush=True)


if __name__ == "__main__":
    main()
