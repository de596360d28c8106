"""One-process TPU session: real-chip scaling anchors + TPU-only test suite.

The axon tunnel charges ~170-520 s of warm-up to the FIRST dispatch of each
process (and a second concurrent client can wedge both), so hardware
evidence is gathered in a single serialized process:

  1. bench_scaling anchor mode  -> JSON lines (appended to
     artifacts/scaling_anchors_r4.jsonl by the caller's redirection)
  2. tests/test_tpu_only.py via pytest.main  -> artifacts/tpu_tests_r4.txt

Run:  NRS_SCALING_REAL=1 NRS_TESTS_TPU=1 python artifacts/r4_tpu_session.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["NRS_SCALING_REAL"] = "1"
os.environ["NRS_TESTS_TPU"] = "1"

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:
    pass

import bench_scaling


def main():
    t0 = time.time()
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    bench_scaling.anchor_main()   # includes its own tunnel warm-up fence
    print(f"anchors done at {time.time() - t0:.0f}s", file=sys.stderr,
          flush=True)

    import pytest

    out = os.path.join(os.path.dirname(__file__), "tpu_tests_r4.txt")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = pytest.main(["-v", "tests/test_tpu_only.py"])
    text = buf.getvalue()
    with open(out, "w") as f:
        f.write(f"# tests/test_tpu_only.py on {jax.devices()[0].device_kind} "
                f"({time.strftime('%Y-%m-%d %H:%M:%S')})\n")
        f.write(text)
    sys.stderr.write(text[-2000:])
    print(f"tpu tests rc={rc}, wrote {out} at {time.time() - t0:.0f}s",
          file=sys.stderr, flush=True)
    return int(rc)


if __name__ == "__main__":
    raise SystemExit(main())
