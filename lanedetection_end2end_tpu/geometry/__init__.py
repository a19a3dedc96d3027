from lanedetection_end2end_tpu.geometry.homography import (  # noqa: F401
    get_perspective_transform,
    bev_matrices_normalized,
    bev_matrices_pixel,
    eval_matrices_normalized,
    homogeneous_transform,
    base_grid,
    projective_grid,
)
