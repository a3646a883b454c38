"""KITTI odometry evaluation harness: run sequences, report ATE / KITTI
drift / throughput (the BASELINE.md configs 2-3).

    python scripts/eval_kitti.py <kitti_odometry_root> [seq ...] \
        [--max-frames N] [--out DIR]

Expects the standard layout: <root>/sequences/<seq>/velodyne/*.bin and
optional <root>/poses/<seq>.txt ground truth.
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent.parent / ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("seqs", nargs="*", default=None)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--out", default="out/kitti")
    args = ap.parse_args()

    from floam_tpu.runner import run_kitti_sequence

    root = Path(args.root)
    seqs = args.seqs or sorted(
        p.name for p in (root / "sequences").iterdir() if p.is_dir())
    results = {}
    for seq in seqs:
        seq_dir = root / "sequences" / seq
        poses = root / "poses" / f"{seq}.txt"
        print(f"=== sequence {seq} ===", flush=True)
        r = run_kitti_sequence(
            seq_dir, poses_path=poses if poses.exists() else None,
            output_dir=Path(args.out) / seq, max_frames=args.max_frames)
        results[seq] = {
            "frames": int(len(r.stamps)),
            "scans_per_sec": round(r.scans_per_sec, 2),
            "ate_m": None if r.ate is None else round(r.ate, 3),
            "drift_pct": None if r.drift_pct is None else round(
                r.drift_pct, 3),
        }
        print(json.dumps({seq: results[seq]}), flush=True)
    out = Path(args.out) / "results.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
