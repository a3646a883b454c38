"""Measure the chunked-upload longrun product loop (cold + warm)."""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))
    from longrun_sim import run_longrun

    r1 = run_longrun(frames=240, noise=0.02, workers=8, ba=False,
                     return_timers=True)
    print("cold:", json.dumps(r1), flush=True)
    r2 = run_longrun(frames=240, noise=0.02, workers=8, ba=False,
                     return_timers=True)
    print("warm:", json.dumps(r2), flush=True)
    r3 = run_longrun(frames=240, noise=0.02, workers=8, ba=True,
                     return_timers=True)
    print("warm+ba:", json.dumps(r3), flush=True)


if __name__ == "__main__":
    main()
