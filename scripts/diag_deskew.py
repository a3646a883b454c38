"""Why does two-phase deskew lose to no-deskew on skewed scans at small
edge budgets? A/B: quirk-3 (edge-as-surf in phase 1) on/off, caps, and
control runs."""
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
    raw_skew, gt_skew = bench.get_scans(base, skew=True)
    skew = [RingScan(xyz=jnp.asarray(s["xyz"]),
                     intensity=jnp.asarray(s["intensity"]),
                     time=jnp.asarray(s["time"]),
                     mask=jnp.asarray(s["mask"])) for s in raw_skew]

    def run(ec, sc, deskew, quirk=True):
        cfg = dataclasses.replace(
            base, odom=dataclasses.replace(
                base.odom, scan_edge_capacity=ec, scan_surf_capacity=sc,
                deskew=deskew, deskew_initial_edge_as_surf=quirk))
        rate, ate = bench.bench_single(cfg, skew, gt_skew)
        print(json.dumps(dict(edge=ec, surf=sc, deskew=deskew,
                              edge_as_surf=quirk, rate=round(rate, 1),
                              ate=round(ate, 4))), flush=True)

    run(512, 4096, False)
    run(512, 4096, True, quirk=True)
    run(512, 4096, True, quirk=False)
    run(1024, 4096, False)
    run(1024, 4096, True, quirk=True)
    run(1024, 4096, True, quirk=False)


if __name__ == "__main__":
    main()
