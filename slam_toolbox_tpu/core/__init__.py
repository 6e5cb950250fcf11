from slam_toolbox_tpu.core import geometry  # noqa: F401
from slam_toolbox_tpu.core.params import MapperConfig  # noqa: F401
from slam_toolbox_tpu.core.scan import (  # noqa: F401
    LaserConfig, LocalizedPointScan, LocalizedScan,
)
