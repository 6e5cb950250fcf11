from slam_toolbox_tpu.api.slam import (  # noqa: F401
    MatchType, ProcessType, SlamSession,
)
