from multiple_objects_gan_tpu.ops.stn import (
    affine_grid,
    grid_sample,
    stn,
    stn_extract,
    stn_extract_multi,
    stn_place,
    stn_place_const_multi,
    stn_place_multi,
    stn_separable,
    transformation_matrix,
    transformation_matrix_inverse,
)

__all__ = [
    "affine_grid",
    "grid_sample",
    "stn",
    "stn_extract",
    "stn_extract_multi",
    "stn_place",
    "stn_place_const_multi",
    "stn_place_multi",
    "stn_separable",
    "transformation_matrix",
    "transformation_matrix_inverse",
]
