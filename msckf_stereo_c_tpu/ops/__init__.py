from .camera import (
    distort_points,
    equidistant_distort_normalized,
    equidistant_undistort_normalized,
    normalized_to_pixel,
    pixel_to_normalized,
    radtan_distort_normalized,
    radtan_undistort_normalized,
    undistort_points,
)
