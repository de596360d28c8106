"""Cold-start measurement (VERDICT r4 next #6).

Measures, in a FRESH process on the real TPU:
  1. the per-process tunnel warm-up (first tiny dispatch),
  2. SlamEngine.prewarm(336, 16) wall time — serial vs threaded
     (NRS_PREWARM_WORKERS), and
  3. whether the persistent compile cache (/root/.jax_cache) is HIT across
     processes (entry count before/after; new entries for the same program
     set mean a miss).

Run it twice back to back:

    python artifacts/coldstart_r5.py serial
    python artifacts/coldstart_r5.py threaded

The pair of runs answers the verdict's question directly: if the second
process's prewarm stays slow while writing fresh cache entries, the floor
is backend compile (the persistent cache does not round-trip on this
backend), not tunnel variance — and the threaded prewarm number is the
achievable mitigation.
"""

import logging
import os
import sys
import time

sys.path.insert(0, "/root/repo")

mode = sys.argv[1] if len(sys.argv) > 1 else "threaded"
os.environ["NRS_PREWARM_WORKERS"] = "1" if mode == "serial" else "8"

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:
    pass

logging.basicConfig(level=logging.WARNING)
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)

import jax.numpy as jnp


def n_cache():
    try:
        return len(os.listdir("/root/.jax_cache"))
    except OSError:
        return 0


def main():
    from navtech_radar_slam_tpu.config import SlamConfig
    from navtech_radar_slam_tpu.models.slam import SlamEngine

    print(f"mode={mode} workers={os.environ['NRS_PREWARM_WORKERS']}",
          flush=True)
    c0 = n_cache()
    t0 = time.time()
    jax.device_get(jnp.add(jnp.ones((8,), jnp.float32), 1.0))
    t_tunnel = time.time() - t0
    print(f"tunnel warm-up (first dispatch): {t_tunnel:.1f}s", flush=True)

    eng = SlamEngine(SlamConfig())
    t0 = time.time()
    eng.prewarm(336, 16, per_scan_azimuths=True, live_outputs=True)
    t_pre = time.time() - t0
    c1 = n_cache()
    print(f"prewarm(336, 16): {t_pre:.1f}s; cache entries {c0} -> {c1} "
          f"({c1 - c0} new)", flush=True)
    print(f"RESULT mode={mode} tunnel={t_tunnel:.1f}s prewarm={t_pre:.1f}s "
          f"new_cache_entries={c1 - c0}", flush=True)


if __name__ == "__main__":
    main()
