from navtech_radar_slam_tpu.utils import geometry  # noqa: F401
