from .pose_graph import (
    optimize_pose_graph,
    sequential_edges,
    detect_loop_closures,
)

__all__ = ["optimize_pose_graph", "sequential_edges", "detect_loop_closures"]
