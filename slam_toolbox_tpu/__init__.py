"""slam_toolbox_tpu — a TPU-native 2D lidar SLAM engine.

A from-scratch re-design of the capabilities of SteveMacenski/slam_toolbox
(correlative scan matching, pose-graph SLAM, loop closure, SE(2) optimization,
occupancy-grid rendering, serialization/resume, localization mode, lifelong
scan decay, multi-session merge) built on JAX/XLA/Pallas for TPU hardware.

Layering (see SURVEY.md §7.1):
  core/    — SE(2) math, scan/sensor models, typed config (reference defaults)
  kernels/ — batched rasterize/smear, correlative matcher, occupancy renderer
  graph/   — pose graph storage + queries (chains, BFS, loop candidates)
  solver/  — sparse Gauss-Newton/LM SE(2) pose-graph optimizer
  mapper/  — the Process* pipeline family (mapping / localization / resume)
  io/      — snapshot serialization, dataset + synthetic world generation
  api/     — user-facing driver mirroring the reference's service surface
  dist/    — multi-device sharding for matching and the distributed solve
"""

__version__ = "0.1.0"

from slam_toolbox_tpu.core.params import MapperConfig  # noqa: F401
