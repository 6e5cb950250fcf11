from slam_toolbox_tpu.mapper.mapper import Mapper  # noqa: F401
