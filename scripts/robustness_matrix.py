"""Robustness matrix: the longrun circuit under simulator realism
stressors — the closest available proxy for what real (KITTI/Velodyne)
data would stress that clean ray-casts do not (VERDICT round-4 item #8):

  * dynamic objects (moving cylinders crossing the course),
  * per-ring and per-point return dropout,
  * range-dependent range noise,
  * systematic per-ring elevation miscalibration.

Writes one JSONL row per configuration to docs/robustness.jsonl and a
markdown table to stdout (paste into docs/PERFORMANCE.md).

Usage: python scripts/robustness_matrix.py [--frames 240] [--workers 8]
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--out", default="docs/robustness.jsonl")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))
    from longrun_sim import run_longrun

    cases = [
        ("clean", {}, 0),
        ("noise_5cm", dict(), 0),  # noise handled via noise arg below
        ("moving_objects_12", {}, 12),
        ("ring_dropout_20pct", dict(dropout_ring_p=0.2), 0),
        ("point_dropout_30pct", dict(dropout_point_p=0.3), 0),
        ("range_noise", dict(noise_range_coeff=0.05), 0),
        ("elev_miscal_0.15deg", dict(elev_miscal_deg=0.15), 0),
        ("combined", dict(dropout_ring_p=0.1, dropout_point_p=0.2,
                          noise_range_coeff=0.05,
                          elev_miscal_deg=0.1), 8),
    ]
    rows = []
    # warm compile on a short clean run
    run_longrun(frames=24, noise=0.02, workers=args.workers, ba=False)
    for name, stress, movers in cases:
        noise = 0.05 if name == "noise_5cm" else 0.02
        r = run_longrun(frames=args.frames, noise=noise,
                        workers=args.workers, ba=False,
                        sim_stressors=stress or None,
                        moving_objects=movers)
        row = {"case": name, "noise": noise, "moving_objects": movers,
               **{f"s_{k}": v for k, v in stress.items()},
               "ate_m": r["longrun_ate_m"],
               "drift_pct": r["longrun_drift_pct"],
               "rate": r["longrun_rate"]}
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")

    print("\n| case | ATE (m) | drift % | scans/s |")
    print("|---|---|---|---|")
    for row in rows:
        print(f"| {row['case']} | {row['ate_m']} | {row['drift_pct']} "
              f"| {row['rate']} |")


if __name__ == "__main__":
    main()
