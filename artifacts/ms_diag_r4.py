"""Multi-session ATE diagnosis (VERDICT r3 next #5).

Reproduces the runB300 shape at medium scale on CPU and separates the
candidate causes of the 0.617 m merged ATE:

  1. B standalone (no prior)           -> baseline ATE of session B alone
  2. B + prior, single device          -> merged ATE, loop-measurement
                                          residuals vs ground truth,
                                          rebase transform error
  3. B + prior, 8-device mesh + chunk  -> the exact runB300 configuration

For each accepted inter-session loop the measurement error vs ground truth
is computed: err = meas  -  (gt_A[i])^{-1} gt_B[j].  If merged ATE >>
standalone ATE while loop errors are small, the bias is in how the factors
pull (e.g. prior-map pose error); if loop errors are large, the ICP
measurements themselves are biased.

Run:  JAX_PLATFORMS=cpu python artifacts/ms_diag_r4.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla:
    os.environ["XLA_FLAGS"] = (xla + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from navtech_radar_slam_tpu.config import SlamConfig
from navtech_radar_slam_tpu.data import RadarSimulator
from navtech_radar_slam_tpu.models.slam import SlamEngine
from navtech_radar_slam_tpu.utils import checkpoint as ckpt
from navtech_radar_slam_tpu.utils import geometry as geo
from navtech_radar_slam_tpu.utils import metrics


def cfg_base(cap=512):
    c = SlamConfig()
    return dataclasses.replace(
        c,
        features=dataclasses.replace(
            c.features, max_features=512, max_matches=256, cart_size=256,
            cart_resolution=1.0, motion_compensation=False,
        ),
        registration=dataclasses.replace(c.registration, spectral_top_k=256),
        keyframes=dataclasses.replace(c.keyframes, max_keyframes=cap),
        icp=dataclasses.replace(
            c.icp, submap_half_size=5, max_query_points=256,
            max_target_points=2048, max_iters=50,
        ),
        pgo=dataclasses.replace(
            c.pgo, max_nodes=cap, max_loop_edges=cap // 4,
            odom_sigma_rot=0.005, odom_sigma_trans=0.05,
        ),
    )


def world_frame(gt0, gts):
    g0 = jnp.asarray(gt0, jnp.float32)
    return np.asarray(
        jnp.stack([geo.se2_between(g0, jnp.asarray(g, jnp.float32)) for g in gts])
    )


def run_session(eng, sim, gts, seed0, t0):
    for i in range(len(gts)):
        eng.process(sim.render(gts[i], noise_seed=seed0 + i),
                    timestamp=t0 + i * 0.25)
    eng.current_pose()
    return eng


def b_ate(eng, gt_b_world):
    traj = eng.trajectory()
    s = eng.session_start
    est = np.asarray(
        [np.asarray(geo.se3_to_se2(jnp.asarray(traj[j])))[:2]
         for j in range(s, eng.num_keyframes)]
    )
    n = min(len(est), len(gt_b_world))
    return metrics.ate_rmse(est[:n], gt_b_world[:n, :2]), est


def loop_residuals(eng, gt_a_world, gt_b_world):
    out = []
    s = eng.session_start
    for e in eng.loops:
        if not (e.prev_idx < s <= e.curr_idx):
            continue
        i, j = e.prev_idx, e.curr_idx - s
        if i >= len(gt_a_world) or j >= len(gt_b_world):
            continue
        gt_rel = np.asarray(geo.se2_between(
            jnp.asarray(gt_a_world[i], jnp.float32),
            jnp.asarray(gt_b_world[j], jnp.float32)))
        err = np.asarray(e.rel_pose[:3], np.float64) - gt_rel
        err[2] = np.arctan2(np.sin(err[2]), np.cos(err[2]))
        out.append((e.prev_idx, e.curr_idx, *err))
    return np.asarray(out)


def main():
    NA, NB = 200, 150
    cfg = cfg_base()
    sim = RadarSimulator(cfg.radar)
    gt_a = sim.circuit_trajectory(NA, radius=10.0, speed=6.0)
    gt_b = sim.circuit_trajectory(NB + 10, radius=10.0, speed=6.0)[10:NB + 10]
    gt_a_world = world_frame(gt_a[0], gt_a)
    gt_b_world = world_frame(gt_a[0], gt_b)   # B gt in A's frame

    print(f"--- session A: {NA} scans")
    eng_a = run_session(SlamEngine(cfg), sim, gt_a, 0, 0.0)
    ate_a = metrics.ate_rmse(
        np.asarray([np.asarray(geo.se3_to_se2(jnp.asarray(t)))[:2]
                    for t in eng_a.trajectory()]),
        gt_a_world[:eng_a.num_keyframes, :2])
    print(f"A: {eng_a.num_keyframes} kf, {len(eng_a.loops)} loops, "
          f"ATE {ate_a:.3f} m")
    ck = "/tmp/ms_diag_a.npz"
    ckpt.save_engine(eng_a, ck)

    print(f"--- session B standalone: {NB} scans")
    eng_b0 = run_session(SlamEngine(cfg), sim, gt_b, 5000, 3600.0)
    est = np.asarray([np.asarray(geo.se3_to_se2(jnp.asarray(t)))[:2]
                      for t in eng_b0.trajectory()])
    gt_b_own = world_frame(gt_b[0], gt_b)
    ate_b0 = metrics.ate_rmse(est, gt_b_own[:len(est), :2])
    print(f"B standalone: {eng_b0.num_keyframes} kf, {len(eng_b0.loops)} "
          f"loops, ATE {ate_b0:.3f} m")

    print("--- session B + prior (single device)")
    eng_b1 = SlamEngine(cfg)
    eng_b1.attach_prior_session(ck)
    run_session(eng_b1, sim, gt_b, 5000, 3600.0)
    ate_b1, _ = b_ate(eng_b1, gt_b_world)
    inter = [e for e in eng_b1.loops
             if e.prev_idx < eng_b1.session_start <= e.curr_idx]
    res = loop_residuals(eng_b1, gt_a_world, gt_b_world)
    print(f"B+prior 1dev: {eng_b1.num_keyframes} kf, {len(inter)} "
          f"inter-session loops, merged ATE {ate_b1:.3f} m")
    if len(res):
        err_t = np.hypot(res[:, 2], res[:, 3])
        print(f"loop meas err vs gt: trans mean {err_t.mean():.3f} m "
              f"p95 {np.percentile(err_t, 95):.3f} m, "
              f"yaw mean {np.abs(res[:, 4]).mean():.4f} rad")
        print("first 5 loops (i, j, dx, dy, dyaw):")
        for r in res[:5]:
            print(f"  ({int(r[0])},{int(r[1])})  {r[2]:+.3f} {r[3]:+.3f} "
                  f"{r[4]:+.4f}")

    print("--- session B + prior (8-device mesh, chunk 16)")
    from navtech_radar_slam_tpu.parallel import make_mesh
    mesh = make_mesh(8)
    eng_b2 = SlamEngine(cfg, mesh=mesh)
    eng_b2.attach_prior_session(ck)
    for c0 in range(0, NB, 16):
        scans = np.stack([sim.render(gt_b[i], noise_seed=5000 + i)
                          for i in range(c0, min(c0 + 16, NB))])
        eng_b2.process_chunk(
            scans, timestamps=[3600.0 + i * 0.25
                               for i in range(c0, min(c0 + 16, NB))])
    eng_b2.current_pose()
    ate_b2, _ = b_ate(eng_b2, gt_b_world)
    inter2 = [e for e in eng_b2.loops
              if e.prev_idx < eng_b2.session_start <= e.curr_idx]
    print(f"B+prior mesh: {eng_b2.num_keyframes} kf, {len(inter2)} "
          f"inter-session loops, merged ATE {ate_b2:.3f} m")

    print("\nSUMMARY")
    print(f"  A ATE                {ate_a:.3f} m")
    print(f"  B standalone ATE     {ate_b0:.3f} m")
    print(f"  B merged ATE (1dev)  {ate_b1:.3f} m")
    print(f"  B merged ATE (mesh)  {ate_b2:.3f} m")


if __name__ == "__main__":
    main()
