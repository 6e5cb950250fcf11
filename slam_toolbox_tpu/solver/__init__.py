from slam_toolbox_tpu.solver.se2_solver import PoseGraphSolver  # noqa: F401
