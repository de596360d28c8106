"""Two REAL processes under `jax.distributed` (gloo CPU collectives): the
multi-host code path of BASELINE config 5 crossed over an actual process
boundary — coordinator handshake, cross-process psum/all_gather in the
sharded bank search and the distributed PGO — not just virtual devices.

The workers (tests/distributed_worker.py) print one JSON line each; both
ranks must agree with each other and with the single-process solver run
in this test process."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "distributed_worker.py")


def test_two_process_distributed_matches_single_process(tmp_path):
    port = _free_port()
    # Minimal env: PYTHONPATH pinned to the repo so no site hook can claim
    # an accelerator at interpreter startup; 4 virtual CPU devices per
    # process -> 8 global.
    env = {
        "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
        "HOME": os.environ.get("HOME", "/root"),
        "PYTHONPATH": REPO,
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "JAX_PLATFORMS": "cpu",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(rank), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=str(tmp_path),
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    r0, r1 = outs
    assert r0["processes"] == r1["processes"] == 2
    assert r0["global_devices"] == r1["global_devices"] == 8
    # both ranks computed the same global result
    assert r0["cand_idx"] == r1["cand_idx"] == 5
    assert abs(r0["cand_dist"] - r1["cand_dist"]) < 1e-5
    np.testing.assert_allclose(
        np.asarray(r0["pose_xy"]), np.asarray(r1["pose_xy"]), atol=1e-4
    )

    # and it matches the single-process reference solver
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import distributed_worker as dw
    from navtech_radar_slam_tpu.models import posegraph as pg

    _, steps = dw.build_inputs()
    cfg = dw.pgo_cfg()
    graph = dw.build_graph(steps, cfg)
    ref = pg.make_solver(cfg)(graph.g)
    np.testing.assert_allclose(
        np.asarray(r0["pose_xy"]), np.asarray(ref.poses[:40, :2, 3]),
        atol=5e-2,
    )
