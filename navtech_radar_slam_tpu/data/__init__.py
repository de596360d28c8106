from navtech_radar_slam_tpu.data.mulran import MulranRadarDataset, decode_polar_scan  # noqa: F401
from navtech_radar_slam_tpu.data.synthetic import RadarSimulator, SimConfig  # noqa: F401
