from .pose_graph import (
    optimize_pose_graph,
    sequential_edges,
    detect_loop_closures,
    detect_loop_closures_batched,
    register_pairs_batched,
    keyframe_normals,
)

__all__ = ["optimize_pose_graph", "sequential_edges", "detect_loop_closures",
           "detect_loop_closures_batched", "register_pairs_batched",
           "keyframe_normals"]
