"""Device kernels: scatter-add, gather, Gaussian blur, searchsorted helpers."""

from .scatter import (  # noqa: F401
    bilinear_gather,
    bilinear_scatter,
    bilinear_scatter_derivative,
    get_default_impl,
    scatter_add_2d,
    scatter_add_flat,
    set_default_impl,
)
from .blur import gaussian_filter, gaussian_blur_image, gaussian_kernel1d  # noqa: F401
from .denoise import (  # noqa: F401
    background_activity_filter,
    filter_background_activity,
)
from .matmul_scatter import bilinear_scatter_matmul  # noqa: F401
from .pallas_scatter import (  # noqa: F401
    bilinear_matmul,
    image_matmul,
    voxel_matmul,
)
