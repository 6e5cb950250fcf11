from slam_toolbox_tpu.graph.pose_graph import Edge, PoseGraph  # noqa: F401
