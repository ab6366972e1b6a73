"""Multi-chip scaling: event-sharded data parallelism over a device mesh.

The reference has no distributed layer at all (SURVEY.md §5.8); this module
is the new, TPU-native scaling design:

- **Event sharding (the "DP" axis)**: the event batch axis is sharded across
  chips with ``shard_map``; each chip scatter-adds its shard into a local
  image/voxel and a single ``psum`` over ICI reduces to the full
  accumulation. Mathematically exact because scatter-add is associative and
  commutative in fp32 summation order per pixel *per shard* (the reduction
  order is fixed by the mesh, so results are deterministic for a fixed
  device count).
- **Spatial / ROI sharding**: ``grid_cmax`` ROIs are embarrassingly parallel;
  the ROI axis of the bucketed batch is sharded so each chip solves its own
  subset of ROIs (no collectives until the final gather).
- **Batch sharding**: windowed voxel batches shard on the batch axis for
  training-input pipelines.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def _mesh_key(mesh: Mesh):
    """Stable cache-key identity for a mesh.

    ``id(mesh)`` can be recycled after garbage collection, which would hand a
    stale executable (compiled for a dead device set) to a new mesh; device
    ids + axis layout cannot.
    """
    return (tuple(d.id for d in mesh.devices.flat), mesh.axis_names,
            mesh.devices.shape)


def _objective_key(objective):
    """Cache-key identity for an objective INCLUDING its tuning knobs: two
    instances of the same class with different thresh/p/lifespan settings
    must never share a compiled solver (the Python floats are baked into the
    traced loss)."""
    return (objective.name, getattr(objective, "thresh", None),
            getattr(objective, "p", None),
            getattr(objective, "adaptive_lifespan", False),
            getattr(objective, "pixel_crossings", 5),
            getattr(objective, "minimum_events", 105))


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "events"):
    """1-D device mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    return Mesh(np.array(devices[:n]), (axis_name,))


def pad_to_multiple(arr, multiple: int, axis: int = 0, fill=0):
    """Pad ``arr`` along ``axis`` to a multiple (returns arr, orig_len)."""
    n = arr.shape[axis]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return arr, n
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, target - n)
    return jnp.pad(arr, pad, constant_values=fill), n


def shard_events(mesh: Mesh, xs, ys, ts, ps, mask=None, axis_name="events"):
    """Pad the event arrays to a multiple of the mesh size and place them
    sharded along the event axis. Returns (xs, ys, ts, ps, mask) on device."""
    n_dev = mesh.shape[axis_name]
    xs = jnp.asarray(xs, jnp.float32)
    ys = jnp.asarray(ys, jnp.float32)
    ts = jnp.asarray(ts, jnp.float32)
    ps = jnp.asarray(ps, jnp.float32)
    if mask is None:
        mask = jnp.ones_like(ps)
    mask = jnp.asarray(mask, jnp.float32)
    out = []
    sharding = NamedSharding(mesh, P(axis_name))
    for a in (xs, ys, ts, ps, mask):
        # pad_to_multiple fills with 0, so the padded tail of the mask is
        # already invalid — no extra masking pass needed.
        padded, _ = pad_to_multiple(a, n_dev)
        out.append(jax.device_put(padded, sharding))
    return tuple(out)


_sharded_voxel_cache: dict = {}


def sharded_events_to_voxel(mesh: Mesh, xs, ys, ts, ps, B: int,
                            sensor_size=(180, 240), mask=None,
                            axis_name: str = "events",
                            temporal_bilinear: bool = True,
                            impl: Optional[str] = None):
    """Voxel grid over an event stream sharded across the mesh.

    Each device scatter-adds its event shard into a local (B, H, W)
    accumulator; one ``psum`` over ICI produces the full grid — the
    event-domain analogue of DP gradient reduction. The time window (t0, t1)
    is computed globally first so per-shard binning agrees. The compiled
    program is cached per (mesh, config).
    """
    from ..representations.voxel_grid import events_to_voxel
    from jax import shard_map

    xs, ys, ts, ps, mask = shard_events(mesh, xs, ys, ts, ps, mask, axis_name)
    key = (_mesh_key(mesh), B, tuple(sensor_size), axis_name,
           temporal_bilinear, impl)
    fn = _sharded_voxel_cache.get(key)
    if fn is None:
        big = jnp.float32(3.4e38)

        def local(xs, ys, ts, ps, mask):
            # global window over valid events
            t0 = jax.lax.pmin(jnp.min(jnp.where(mask != 0, ts, big)),
                              axis_name)
            t1 = jax.lax.pmax(jnp.max(jnp.where(mask != 0, ts, -big)),
                              axis_name)
            # impl='matmul' runs the per-shard Pallas MXU kernel on TPU
            # meshes (each shard is contiguous in the time-sorted stream,
            # so the kernel's sortedness requirement holds per shard)
            vox = events_to_voxel(xs, ys, ts, ps, B, sensor_size=sensor_size,
                                  temporal_bilinear=temporal_bilinear,
                                  mask=mask, t0=t0, t1=t1, impl=impl)
            return jax.lax.psum(vox, axis_name)

        fn = jax.jit(shard_map(local, mesh=mesh,
                               in_specs=(P(axis_name),) * 5,
                               out_specs=P()))
        _sharded_voxel_cache[key] = fn
    return fn(xs, ys, ts, ps, mask)


def sharded_iwe(mesh: Mesh, params, xs, ys, ts, ps, warpfunc, img_size,
                mask=None, axis_name: str = "events", use_polarity=True):
    """IWE formation with the event axis sharded and the image psum-reduced.
    Differentiable w.r.t. ``params`` (the psum's cotangent broadcasts back to
    every shard's gather — XLA handles this)."""
    from ..models.objectives import get_iwe
    from jax import shard_map

    xs, ys, ts, ps, mask = shard_events(mesh, xs, ys, ts, ps, mask, axis_name)
    key = (_mesh_key(mesh), type(warpfunc).__name__, tuple(img_size), axis_name,
           use_polarity)
    fn = _sharded_iwe_cache.get(key)
    if fn is None:
        big = jnp.float32(3.4e38)

        def local(params, xs, ys, ts, ps, mask):
            t0 = jax.lax.pmax(jnp.max(jnp.where(mask != 0, ts, -big)),
                              axis_name)
            iwe, _ = get_iwe(params, xs, ys, ts, ps, warpfunc, img_size,
                             use_polarity=use_polarity, mask=mask, t0=t0)
            return jax.lax.psum(iwe, axis_name)

        fn = jax.jit(shard_map(local, mesh=mesh,
                               in_specs=(P(), P(axis_name), P(axis_name),
                                         P(axis_name), P(axis_name),
                                         P(axis_name)),
                               out_specs=P()))
        _sharded_iwe_cache[key] = fn
    return fn(jnp.asarray(params, jnp.float32), xs, ys, ts, ps, mask)


_sharded_iwe_cache: dict = {}


def sharded_events_to_timestamp_image(mesh: Mesh, xs, ys, ts, ps,
                                      sensor_size=(180, 240), mask=None,
                                      padding: bool = True,
                                      timestamp_reverse: bool = False,
                                      axis_name: str = "events",
                                      impl: Optional[str] = None):
    """Average-timestamp images (Zhu CVPR'19) over a mesh-sharded stream.

    The image is a per-pixel RATIO of global sums, so each shard
    accumulates the four raw channels (ts*pos, pos, ts*neg, neg — the
    `representations.image._timestamp_weight_sums` core), one ``psum``
    reduces the stack over ICI, and the count division happens globally.
    Timestamp normalization uses the global (pmin/pmax) window so shards
    agree. Completes the `parallel` accumulation set (voxel / IWE /
    timestamp image).
    """
    from ..representations.image import _timestamp_weight_sums
    from jax import shard_map

    H, W = sensor_size
    xs, ys, ts, ps, mask = shard_events(mesh, xs, ys, ts, ps, mask, axis_name)
    key = (_mesh_key(mesh), tuple(sensor_size), axis_name, padding,
           timestamp_reverse, impl)
    fn = _sharded_tsimg_cache.get(key)
    if fn is None:
        big = jnp.float32(3.4e38)
        img_size = (H + 1, W + 1) if padding else (H, W)
        clipx, clipy = img_size[1] - 1, img_size[0] - 1

        def local(xs, ys, ts, ps, mask):
            t_first = jax.lax.pmin(jnp.min(jnp.where(mask != 0, ts, big)),
                                   axis_name)
            t_last = jax.lax.pmax(jnp.max(jnp.where(mask != 0, ts, -big)),
                                  axis_name)
            eps = 1e-6
            if timestamp_reverse:
                tn = (-ts + t_last) / (t_last - t_first + eps)
            else:
                tn = (ts - t_first) / (t_last - t_first + eps)
            stack = _timestamp_weight_sums(
                jnp.asarray(xs, jnp.float32), jnp.asarray(ys, jnp.float32),
                tn, jnp.asarray(ps, jnp.float32), mask, img_size,
                clipx, clipy, True, False, impl)
            stack = jax.lax.psum(stack, axis_name)
            img_pos = stack[0] / jnp.maximum(1.0 + stack[1], 1.0)
            img_neg = stack[2] / jnp.maximum(1.0 + stack[3], 1.0)
            return img_pos, img_neg

        fn = jax.jit(shard_map(local, mesh=mesh,
                               in_specs=(P(axis_name),) * 5,
                               out_specs=(P(), P())))
        _sharded_tsimg_cache[key] = fn
    return fn(xs, ys, ts, ps, mask)


_sharded_tsimg_cache: dict = {}


def make_sharded_cmax_train_step(mesh: Mesh, objective, warpfunc, img_size,
                                 blur_sigma: float = 1.0, lr: float = 0.5,
                                 momentum: float = 0.9, normalize_grad=True,
                                 axis_name: str = "events"):
    """Build the framework's multi-chip "training step": one compiled SGD
    update of contrast maximisation over mesh-sharded events.

    The loss is the objective of the psum-reduced, blurred IWE; its gradient
    w.r.t. the motion parameters is computed end-to-end through the
    collective. The gradient is direction-normalized by default (contrast
    objectives have wildly varying curvature scales across sequences).

    Returns a jitted ``step(params, opt_state, xs, ys, ts, ps, mask)
    -> (new_params, new_opt_state, loss)`` over *already sharded* arrays
    (see :func:`shard_events`). Build once, call many times — each call
    reuses the compiled executable.
    """
    from ..models.objectives import get_iwe
    from ..ops.blur import gaussian_filter
    from jax import shard_map

    big = jnp.float32(3.4e38)

    def loss_fn(params, xs, ys, ts, ps, mask):
        t0 = jax.lax.pmax(jnp.max(jnp.where(mask != 0, ts, -big)), axis_name)
        iwe, _ = get_iwe(params, xs, ys, ts, ps, warpfunc, img_size,
                         use_polarity=objective.use_polarity, mask=mask, t0=t0)
        iwe = jax.lax.psum(iwe, axis_name)
        if blur_sigma and blur_sigma > 0:
            iwe = gaussian_filter(iwe, blur_sigma)
        return objective.loss_fn(iwe)

    def step(params, mom, xs, ys, ts, ps, mask):
        loss, grad = jax.value_and_grad(loss_fn)(params, xs, ys, ts, ps, mask)
        if normalize_grad:
            grad = grad / (jnp.linalg.norm(grad) + 1e-12)
        mom = momentum * mom + grad
        params = params - lr * mom
        return params, mom, loss

    # NB check_vma must stay ON: disabling it turns the psum's transpose
    # into identity, so each device would apply ONLY its own shard's
    # gradient and the P() outputs would silently return device 0's
    # diverged parameters (regression-tested against the single-device
    # step in tests/test_parallel.py).
    fn = shard_map(step, mesh=mesh,
                   in_specs=(P(), P(), P(axis_name), P(axis_name),
                             P(axis_name), P(axis_name), P(axis_name)),
                   out_specs=(P(), P(), P()))
    return jax.jit(fn)


def sharded_cmax_train_step(mesh: Mesh, params, opt_state, xs, ys, ts, ps,
                            objective, warpfunc, img_size, mask=None,
                            blur_sigma: float = 1.0, lr: float = 0.5,
                            axis_name: str = "events"):
    """Convenience one-shot wrapper around
    :func:`make_sharded_cmax_train_step` (shards the events, builds/caches
    the step for this config, runs one update)."""
    key = (_mesh_key(mesh), _objective_key(objective),
           type(warpfunc).__name__, tuple(img_size), blur_sigma, lr,
           axis_name)
    step = _train_step_cache.get(key)
    if step is None:
        step = make_sharded_cmax_train_step(
            mesh, objective, warpfunc, img_size, blur_sigma=blur_sigma,
            lr=lr, axis_name=axis_name)
        _train_step_cache[key] = step
    xs, ys, ts, ps, mask = shard_events(mesh, xs, ys, ts, ps, mask, axis_name)
    params = jnp.asarray(params, jnp.float32)
    if opt_state is None:
        opt_state = jnp.zeros_like(params)
    return step(params, opt_state, xs, ys, ts, ps, mask)


_train_step_cache: dict = {}


def sharded_grid_cmax(mesh: Mesh, xs, ys, ts, ps, roi_size=(20, 20),
                      img_size=None, warp=None, obj=None,
                      min_events: int = 10,
                      blur_sigma: float = 1.0, maxiter: int = 50,
                      capacity: Optional[int] = None,
                      axis_name: str = "events"):
    """grid_cmax with the ROI axis sharded across the mesh: each chip runs
    the identical per-ROI solver ``grid_cmax_batched`` uses (patch-matmul
    loss for every objective, velocity-capped grid search + fixed-step
    refine) on its subset of ROIs, with zero inter-chip communication until
    the result gather."""
    from ..contrast_max.events_cmax import (bucket_events_by_roi,
                                            make_roi_solve_one)
    from ..models.warps import linvel_warp
    from ..models.objectives import variance_objective
    from ..utils.event_util import infer_resolution

    warp = linvel_warp() if warp is None else warp
    obj = variance_objective() if obj is None else obj
    resolution = infer_resolution(xs, ys) if img_size is None else img_size
    rh, rw = roi_size

    bx, by, bt, bp, bmask, origins, _ = bucket_events_by_roi(
        xs, ys, ts, ps, resolution, roi_size, capacity)
    n_dev = mesh.shape[axis_name]
    R = bx.shape[0]
    # pad ROI axis to mesh multiple
    bx, _ = pad_to_multiple(bx, n_dev)
    by, _ = pad_to_multiple(by, n_dev)
    bt, _ = pad_to_multiple(bt, n_dev)
    bp, _ = pad_to_multiple(bp, n_dev)
    bmask, _ = pad_to_multiple(bmask, n_dev)
    borigins, _ = pad_to_multiple(jnp.asarray(origins, jnp.float32), n_dev)

    key = (_mesh_key(mesh), type(warp).__name__, _objective_key(obj),
           tuple(resolution), tuple(roi_size), float(blur_sigma),
           int(maxiter), axis_name)
    fn = _sharded_cmax_cache.get(key)
    if fn is None:
        solve_one = make_roi_solve_one(warp, obj, tuple(resolution),
                                       tuple(roi_size), blur_sigma, maxiter)
        sharding = NamedSharding(mesh, P(axis_name))
        fn = jax.jit(jax.vmap(solve_one),
                     in_shardings=(sharding,) * 6,
                     out_shardings=(sharding, sharding))
        _sharded_cmax_cache[key] = fn
    params, f_evals = fn(bx, by, bt, bp, bmask, borigins)
    # Same return contract as grid_cmax_batched: (R, 4) rois and the same
    # min_events validity gate, so the two are drop-in substitutes.
    rois = jnp.concatenate(
        [jnp.asarray(origins, jnp.float32),
         jnp.tile(jnp.asarray([[rh, rw]], jnp.float32), (R, 1))], axis=-1)
    return (params[:R], rois, f_evals[:R],
            jnp.sum(bmask[:R], axis=1) > min_events)


_sharded_cmax_cache: dict = {}
