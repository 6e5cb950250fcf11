from slam_toolbox_tpu.core import geometry  # noqa: F401
from slam_toolbox_tpu.core.params import MapperConfig  # noqa: F401
from slam_toolbox_tpu.core.scan import LaserConfig, LocalizedScan  # noqa: F401
