"""Raw-event-stream augmentation (host numpy + device JAX variants)."""

from .event_augmentation import (  # noqa: F401
    add_correlated_events,
    add_random_events,
    block_to_events,
    crop_events,
    events_to_block,
    flip_events_x,
    flip_events_x_jax,
    flip_events_y,
    flip_events_y_jax,
    jitter_events_jax,
    merge_events,
    remove_events,
    remove_events_mask_jax,
    rotate_events,
    rotate_events_jax,
    sample,
)
