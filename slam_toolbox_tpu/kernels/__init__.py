from slam_toolbox_tpu.kernels.match import Matcher, MatchResult  # noqa: F401
