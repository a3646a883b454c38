"""Diagnose host-RSS growth on the exporting product loop (endurance run)."""
import gc
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent.parent / ".jax_cache"))

from floam_tpu.config import FloamConfig
from floam_tpu.runner import SequenceRunner, chunked_device_stream

CACHE = Path(sys.argv[1] if len(sys.argv) > 1 else ".endurance_cache")
FRAMES = int(sys.argv[2]) if len(sys.argv) > 2 else 400
EXPORTS = "--no-exports" not in sys.argv


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0


def host_stream():
    f = 0
    c = 0
    while f < FRAMES:
        z = np.load(CACHE / f"chunk_{c:04d}.npz")
        data, counts, meta = z["data"], z["counts"], z["meta"]
        for j in range(data.shape[0]):
            yield 0.1 * f, (data[j], counts[j], meta[j])
            f += 1
            if f >= FRAMES:
                return
        c += 1


cfg = FloamConfig.kitti_hdl64()
out = "/tmp/floam_diag_rss" if EXPORTS else None
if out:
    Path(out).mkdir(exist_ok=True)
runner = SequenceRunner(cfg, output_dir=out)

gen = chunked_device_stream(host_stream(), chunk=8)
probe = {}


def wrapped():
    t_last = time.perf_counter()
    for i, item in enumerate(gen):
        if i % 50 == 0:
            gc.collect()
            la = jax.live_arrays()
            nbytes = sum(a.nbytes for a in la)
            now = time.perf_counter()
            print(f"frame {i}: rss={rss_mb():.0f}MB live_arrays={len(la)} "
                  f"live_bytes={nbytes / 2**20:.0f}MB "
                  f"rate={50 / (now - t_last):.0f}/s", flush=True)
            t_last = now
            if i == 350:
                from collections import Counter

                by = Counter()
                for a in la:
                    by[tuple(a.shape)] += a.nbytes
                print("mid-run bytes by shape:",
                      sorted(by.items(), key=lambda kv: -kv[1])[:12],
                      flush=True)
                cnt = Counter(tuple(a.shape) for a in la)
                print("mid-run count by shape:", cnt.most_common(12),
                      flush=True)
        yield item


res = runner.run(wrapped())
gc.collect()
la = jax.live_arrays()
print(f"end: rss={rss_mb():.0f}MB live_arrays={len(la)} "
      f"live_bytes={sum(a.nbytes for a in la) / 2**20:.0f}MB "
      f"rate={res.scans_per_sec:.1f} steady={res.scans_per_sec_steady:.1f}")
from collections import Counter

c = Counter(tuple(a.shape) for a in la)
print("top shapes:", c.most_common(12))
