from infgen_tpu.utils.geometry import (  # noqa: F401
    wrap_angle,
    angle_between_2d_vectors,
    cal_polygon_contour,
    rot_mat_2d,
    transform_to_global,
    transform_to_local,
)
