"""Same-process A/B of the 4-bit packed wire format vs raw uint8 streaming.

Cross-run comparisons on the tunneled backend are confounded by 2-3x
bandwidth drift between measurement windows (seen across bench_r5b/r5c and
the ordering matrix).  This script alternates u8 and packed-4 BLOCKS of
chunks through ONE engine in ONE process, so both arms sample the same
link conditions; per-block scan rates are printed and the medians
compared.

    python artifacts/ab_pack4_r5.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:
    pass

import numpy as np

from navtech_radar_slam_tpu.config import SlamConfig
from navtech_radar_slam_tpu.data import RadarSimulator
from navtech_radar_slam_tpu.data.packing import pack4
from navtech_radar_slam_tpu.models.slam import SlamEngine


def main():
    cfg = SlamConfig()
    sim = RadarSimulator(cfg.radar)
    chunk, block, n_blocks = 16, 6, 6      # u8/q4 alternating blocks
    n_scans = chunk * block * n_blocks + 2 * chunk
    gt = sim.circuit_trajectory(n_scans, radius=10.0, speed=6.0)
    print(f"rendering {n_scans} scans...", flush=True)
    scans = np.stack([
        (np.clip(sim.render(gt[i], noise_seed=i), 0, 1) * 255)
        .astype(np.uint8) for i in range(n_scans)
    ])
    packed = pack4(scans)

    eng = SlamEngine(cfg)
    t0 = time.time()
    eng.prewarm(n_scans, chunk, pack4=False)
    eng.prewarm(n_scans, chunk, pack4=True, full=False)
    print(f"prewarm (both wire formats): {time.time() - t0:.1f}s", flush=True)

    # warm: one chunk per format
    eng.process_chunk(jax.device_put(scans[0:chunk]))
    eng.process_chunk(jax.device_put(packed[chunk:2 * chunk]))
    eng.current_pose()

    rates = {"u8": [], "q4": []}
    c0 = 2 * chunk
    for b in range(n_blocks):
        arm = "u8" if b % 2 == 0 else "q4"
        src = scans if arm == "u8" else packed
        t0 = time.time()
        eng.begin_chunk(jax.device_put(src[c0:c0 + chunk]))
        for cc in range(c0 + chunk, c0 + block * chunk, chunk):
            eng.begin_chunk(jax.device_put(src[cc:cc + chunk]))
            eng.finish_chunk()
        eng.finish_chunk()
        eng.current_pose()            # fence the block
        dt = time.time() - t0
        r = block * chunk / dt
        rates[arm].append(r)
        print(f"block {b} ({arm}): {r:.2f} scans/s", flush=True)
        c0 += block * chunk

    for arm in ("u8", "q4"):
        print(f"{arm}: median {np.median(rates[arm]):.2f} scans/s "
              f"(runs: {np.round(rates[arm], 2)})", flush=True)


if __name__ == "__main__":
    main()
