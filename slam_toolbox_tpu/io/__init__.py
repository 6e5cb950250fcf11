from slam_toolbox_tpu.io.dataset import LidarSimulator, SegmentWorld  # noqa: F401
