"""event_utils_tpu — a TPU-native event-camera framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
TimoStoff/event_utils (reference: /root/reference):

- ``ops``             core device kernels: bilinear/integer scatter-add,
                      bilinear gather, scipy-parity Gaussian blur
                      (replaces torch ``index_put_``/``np.bincount``/
                      ``F.grid_sample``/``scipy.ndimage.gaussian_filter``)
- ``utils``           event masks / clipping / windowing / hot-pixel removal
- ``representations`` event image, average-timestamp image, voxel grids
- ``models``          parametric warp models + contrast objectives
- ``contrast_max``    jitted contrast-maximisation optimizers, grid search,
                      ROI-tiled ``grid_cmax``, dIWE segmentation
- ``transforms``      dense-optic-flow event warping
- ``augmentation``    RNG-keyed raw-event-stream augmentation
- ``data_formats``    HDF5 / memmap / npy readers & packagers, converters
- ``data_loaders``    windowed voxel datasets + double-buffered device prefetch
- ``parallel``        jax.sharding mesh utilities, event-sharded accumulation
- ``simulation``      ESIM-style event-camera simulator (ground-truth data)
- ``visualization``   matplotlib 3-D event / voxel / flow renderers
- ``cli``             visualize / convert / simulate entry points

Events are component arrays ``(xs, ys, ts, ps)`` exactly as in the reference
API, with an optional validity ``mask`` everywhere so irregular event counts
map onto XLA's static shapes (bucketed padding instead of ragged arrays).
"""

__version__ = "0.4.0"


def _apply_platform_env():
    """Honor ``EVENT_UTILS_TPU_PLATFORM`` (e.g. ``cpu``) at import.

    Out-of-process backend selection via ``JAX_PLATFORMS`` is unreliable
    with plugin backends (the tunnel plugin used in development ignores
    it), and every CLI would otherwise need in-process
    ``jax.config.update`` boilerplate to run host-side — e.g. dataset
    pre-materialization, or keeping work moving through an accelerator
    outage. Applied only when the variable is set; harmless if jax's
    backend is already initialized to the same value."""
    import os

    platform = os.environ.get("EVENT_UTILS_TPU_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


_apply_platform_env()

from . import errors  # noqa: F401
from . import ops, utils, representations, models, contrast_max  # noqa: F401
from . import transforms, augmentation, data_formats, data_loaders  # noqa: F401
from . import parallel, visualization, native, training  # noqa: F401
from . import simulation  # noqa: F401
