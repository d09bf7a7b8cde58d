from sapcu_tpu.ops.grouping import (
    ball_query,
    group_points,
    three_nn,
    three_interpolate,
    interpolate_features,
    pca_normals,
)
from sapcu_tpu.ops.pointops import (
    pairwise_sqdist,
    knn,
    knn_tiled,
    index_points,
    index_points_matmul,
    graph_feature,
    farthest_point_sample,
    farthest_point_sample_masked,
    rotation_to_target,
    rotate_points,
    point_triangle_closest,
)

__all__ = [
    "ball_query", "group_points", "three_nn", "three_interpolate",
    "interpolate_features", "pca_normals",
    "pairwise_sqdist",
    "knn",
    "knn_tiled",
    "index_points",
    "index_points_matmul",
    "graph_feature",
    "farthest_point_sample",
    "farthest_point_sample_masked",
    "rotation_to_target",
    "rotate_points",
    "point_triangle_closest",
]
