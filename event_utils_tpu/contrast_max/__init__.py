"""Contrast maximisation: optimizers, grid search, grid_cmax, segmentation.

Warp models and objectives live in ``event_utils_tpu.models`` and are
re-exported here so user code mirroring the reference's
``lib/contrast_max`` import paths keeps working.
"""

from ..models.objectives import (  # noqa: F401
    OBJECTIVE_REGISTRY,
    get_iwe,
    get_objective,
    isoa_objective,
    moa_objective,
    objective_function,
    r1_objective,
    rms_objective,
    soe_objective,
    sos_objective,
    sosa_objective,
    variance_objective,
    zhu_timestamp_objective,
)
from ..models.warps import (  # noqa: F401
    WARP_REGISTRY,
    get_warp,
    linvel_warp,
    pure_rotation_warp,
    warp_function,
    xyztheta_warp,
)
from .events_cmax import (  # noqa: F401
    bucket_events_by_roi,
    draw_objective_function,
    find_new_range,
    fit_global_motion,
    get_hsv_shifted,
    grid_cmax,
    grid_cmax_batched,
    xyztheta_velocity_at,
    grid_search_initial,
    grid_search_optimisation,
    grid_search_refine,
    make_objective_loss,
    make_patch_loss,
    make_patch_variance_loss,
    optimize,
    optimize_contrast,
    optimize_contrast_jit,
    optimize_r2,
    recursive_search,
    segmentation_mask_from_d_iwe,
)
