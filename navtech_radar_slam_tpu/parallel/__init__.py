from navtech_radar_slam_tpu.parallel.mesh import make_mesh  # noqa: F401
