from ntm_tracker_tpu.data.geometry import (
    apply_transformation,
    bbox_legal,
    calculate_cropbox,
    calculate_offsets,
    calculate_transformation,
    discrete_gauss,
    generate_gt,
    matlab_style_gauss2D,
    normalize_bbox,
    offset_bbox,
)
from ntm_tracker_tpu.data.image_ops import (
    crop_and_resize,
    tf1_resize_bilinear,
    preprocess_frame,
)
