"""Event-camera simulation (ESIM-style) — ground-truth data generation."""

from .esim import (Scene, SimulatedEvents, SimulatorConfig, affine_scene,
                   hot_pixel_map, rotating_scene, simulate_events,
                   simulate_events_device, simulate_scene, smooth_texture,
                   translating_scene)

__all__ = [
    "Scene", "SimulatedEvents", "SimulatorConfig", "affine_scene",
    "hot_pixel_map", "rotating_scene", "simulate_events",
    "simulate_events_device", "simulate_scene", "smooth_texture",
    "translating_scene",
]
