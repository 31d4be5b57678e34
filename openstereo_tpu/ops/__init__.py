from .cost_volume import (  # noqa: F401
    correlation_volume,
    build_gwc_volume,
    build_concat_volume,
    build_corr_volume,
    build_diff_volume,
    build_sub_volume,
    groupwise_correlation,
)
from .disp_regression import disparity_regression  # noqa: F401
from .upsample import (  # noqa: F401
    context_upsample,
    unfold3x3,
    upsample_nearest,
    resize_bilinear,
    resize_linear_align_corners,
    resize_bicubic_torch,
    resize_linear_torch,
)
from .sampler import bilinear_sampler, disp_warp, sample_along_w  # noqa: F401
from .conv3d import conv3d_tap_merged, Conv3DTapMerged  # noqa: F401
