from slam_toolbox_tpu.utils.metrics import Stats, stage_timer  # noqa: F401
