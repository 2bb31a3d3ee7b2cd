from i2pnet_tpu.ops.quaternion import (
    qconj,
    qinv,
    qmul,
    qrotate,
    quat_to_rotmat,
    rotmat_to_quat,
    warp_points,
    warp_to_normalized_plane,
    compose_pose,
)
from i2pnet_tpu.ops.pointops import (
    square_distance,
    knn_point,
    masked_knn_point,
    index_points,
    group_points,
    farthest_point_sample,
    ball_query,
    three_nn,
    three_interpolate,
    sample_and_group,
    grouping,
)
