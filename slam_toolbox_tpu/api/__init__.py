from slam_toolbox_tpu.api.slam import ProcessType, SlamSession  # noqa: F401
