"""Worker process for the 2-process `jax.distributed` smoke test
(tests/test_distributed_multiprocess.py) — BASELINE config 5's code path
exercised across a real process boundary, not just virtual devices.

Each of the two processes hosts 4 virtual CPU devices (8 global), calls
`parallel.mesh.init_distributed`, builds the global mesh, and runs
  * one sharded ScanContext bank search (all-shift correlation + global
    argmin over collectives), and
  * one distributed pose-graph solve (edge-sharded loop factors)
on deterministic data, printing one JSON line the test compares across
ranks and against the single-process solver.

Usage: python distributed_worker.py <rank> <port>
"""

import json
import os
import sys


def build_inputs():
    """Deterministic test problem, identical on every rank."""
    import numpy as np

    rng = np.random.default_rng(42)
    bank = rng.random((64, 20, 60)).astype(np.float32)
    # pose chain: 40 nodes, noisy unit steps, loops every 4th node
    steps = np.stack(
        [1.0 + rng.normal(0, 0.05, 39), rng.normal(0, 0.05, 39),
         rng.normal(0, 0.01, 39)], 1
    ).astype(np.float32)
    return bank, steps


def build_graph(steps, cfg):
    import jax.numpy as jnp
    import numpy as np

    from navtech_radar_slam_tpu.models import posegraph as pg
    from navtech_radar_slam_tpu.utils import geometry as geo

    graph = pg.PoseGraph(cfg)
    pose = np.eye(4, dtype=np.float32)
    graph.add_node(pose)
    gt = [pose.copy()]
    for k in range(len(steps)):
        gt.append(gt[-1] @ np.asarray(
            geo.se2_to_se3(jnp.asarray([1.0, 0.0, 0.0], jnp.float32))))
        meas = np.asarray(geo.se2_to_se3(jnp.asarray(steps[k], jnp.float32)))
        pose = pose @ meas
        graph.add_node(pose, odom_meas=meas)
    for j in range(8, 40, 4):
        graph.add_loop(j - 8, j, np.asarray(
            geo.se3_between(jnp.asarray(gt[j - 8]), jnp.asarray(gt[j]))))
    return graph


def pgo_cfg():
    import dataclasses

    from navtech_radar_slam_tpu.config import PgoConfig

    return dataclasses.replace(
        PgoConfig(), max_nodes=64, max_loop_edges=8,
        gn_iters=4, cg_iters=48, odom_sigma_rot=0.01, odom_sigma_trans=0.05,
    )


def main() -> int:
    rank = int(sys.argv[1])
    port = sys.argv[2]
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from navtech_radar_slam_tpu.parallel.mesh import init_distributed

    n_global = init_distributed(f"localhost:{port}", num_processes=2,
                                process_id=rank)
    assert n_global == 8, n_global
    assert jax.process_count() == 2

    import jax.numpy as jnp
    import numpy as np

    from navtech_radar_slam_tpu.config import ScanContextConfig
    from navtech_radar_slam_tpu.parallel import mesh as mesh_mod
    from navtech_radar_slam_tpu.parallel.dist_pgo import make_distributed_solver
    from navtech_radar_slam_tpu.parallel.sharded_bank import (
        make_sharded_loop_detector,
    )

    mesh = mesh_mod.make_mesh()            # all 8 global devices, 2 hosts
    sh = mesh_mod.bank_sharding(mesh)
    rep = mesh_mod.replicated(mesh)

    def put(arr, sharding):
        arr = np.asarray(arr)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    bank_h, steps = build_inputs()

    # --- sharded bank search across the process boundary ------------------
    sc_cfg = ScanContextConfig(num_exclude_recent=4)
    detect = make_sharded_loop_detector(mesh, sc_cfg)
    bank = put(bank_h, sh)
    query = jnp.asarray(bank_h[5])
    cand = detect(query, bank, jnp.asarray(64))
    cand_idx = int(np.asarray(cand.idx.addressable_data(0)))
    cand_dist = float(np.asarray(cand.dist.addressable_data(0)))

    # --- distributed PGO across the process boundary ----------------------
    cfg = pgo_cfg()
    graph = build_graph(steps, cfg)
    g = graph.g
    g = g._replace(
        poses=put(g.poses, rep),
        num_nodes=put(g.num_nodes, rep),
        odom_meas=put(g.odom_meas, sh),
        odom_valid=put(g.odom_valid, sh),
        gps_meas=put(g.gps_meas, sh),
        gps_valid=put(g.gps_valid, sh),
        loop_i=put(g.loop_i, sh),
        loop_j=put(g.loop_j, sh),
        loop_meas=put(g.loop_meas, sh),
        loop_valid=put(g.loop_valid, sh),
    )
    solver = make_distributed_solver(mesh, cfg)
    poses = solver(g)
    poses_h = np.asarray(poses.addressable_data(0))  # replicated output

    print(json.dumps({
        "rank": rank,
        "processes": int(jax.process_count()),
        "global_devices": int(len(jax.devices())),
        "cand_idx": cand_idx,
        "cand_dist": round(cand_dist, 6),
        "pose_xy": [[round(float(x), 5) for x in p]
                    for p in poses_h[:40, :2, 3]],
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
