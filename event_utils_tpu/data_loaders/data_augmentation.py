"""Tensor transforms for voxel/frame/flow batches.

Rebuild of reference ``lib/data_loaders/data_augmentation.py`` without torch:
transforms operate on numpy or JAX arrays shaped ``(C, H, W)`` and keep the
reference's flow-aware ``__call__(x, is_flow=False)`` protocol.
"""

from __future__ import annotations

import numbers
from typing import Optional, Sequence

import numpy as np
from ..errors import ConfigurationError, RegistryError


class Compose:
    """Chain transforms (reference data_augmentation.py:6-39)."""

    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, x, is_flow: bool = False):
        for t in self.transforms:
            x = t(x, is_flow)
        return x

    def __repr__(self):
        inner = "\n".join(f"    {t}" for t in self.transforms)
        return f"{self.__class__.__name__}(\n{inner}\n)"


class CenterCrop:
    """Center-crop a (C, H, W) tensor (reference data_augmentation.py:42-80),
    with the mosaicing-pattern-preserving even-offset option."""

    def __init__(self, size, preserve_mosaicing_pattern: bool = False):
        if isinstance(size, numbers.Number):
            self.size = (int(size), int(size))
        else:
            self.size = tuple(size)
        self.preserve_mosaicing_pattern = preserve_mosaicing_pattern

    def __call__(self, x, is_flow: bool = False):
        h, w = x.shape[1], x.shape[2]
        th, tw = self.size
        assert th <= h and tw <= w
        i = int(round((h - th) / 2.0))
        j = int(round((w - tw) / 2.0))
        if self.preserve_mosaicing_pattern:
            i += i % 2
            j += j % 2
        return x[:, i:i + th, j:j + tw]

    def __repr__(self):
        return f"{self.__class__.__name__}(size={self.size})"


class RandomCrop:
    """Random crop (new; the stochastic complement of CenterCrop for
    training pipelines).

    Offsets come from the stdlib ``random`` module by default:
    ``BaseVoxelDataset._apply`` synchronizes an item's voxel/frame/flow
    transforms by re-seeding ``random`` with a shared per-item seed, so a
    module-level draw gives all three the SAME crop window (a private
    ``np.random.Generator`` here would silently desynchronize them). Pass
    an explicit ``rng`` only for standalone use outside the dataset."""

    def __init__(self, size, rng: Optional[np.random.Generator] = None):
        if isinstance(size, numbers.Number):
            self.size = (int(size), int(size))
        else:
            self.size = tuple(size)
        self.rng = rng

    def __call__(self, x, is_flow: bool = False):
        import random

        h, w = x.shape[1], x.shape[2]
        th, tw = self.size
        if th > h or tw > w:
            raise ConfigurationError(
                f"RandomCrop size {self.size} exceeds input {(h, w)}")
        if self.rng is not None:
            i = int(self.rng.integers(0, h - th + 1))
            j = int(self.rng.integers(0, w - tw + 1))
        else:
            i = random.randint(0, h - th)
            j = random.randint(0, w - tw)
        return x[:, i:i + th, j:j + tw]


class RobustNorm:
    """Percentile-clamped normalisation (reference data_augmentation.py:83-136).

    Uses nearest-rank percentiles (the reference's ``kthvalue`` semantics) and
    the reference's exact normalisation ``(clamped - min) / (max + eps)``.
    """

    def __init__(self, low_perc: float = 0, top_perc: float = 95):
        self.low_perc = low_perc
        self.top_perc = top_perc

    @staticmethod
    def percentile(t, q):
        t = np.asarray(t)
        k = 1 + round(0.01 * float(q) * (t.size - 1))
        return float(np.partition(t.reshape(-1), k - 1)[k - 1])

    def __call__(self, x, is_flow: bool = False):
        xn = np.asarray(x)
        t_max = self.percentile(xn, self.top_perc)
        t_min = self.percentile(xn, self.low_perc)
        if t_max == 0 and t_min == 0:
            return x
        eps = 1e-6
        normed = np.clip(xn, t_min, t_max)
        return (normed - normed.min()) / (normed.max() + eps)

    def __repr__(self):
        return (f"{self.__class__.__name__}(top_perc={self.top_perc:.2f}, "
                f"low_perc={self.low_perc:.2f})")


TRANSFORM_REGISTRY = {
    "Compose": Compose,
    "CenterCrop": CenterCrop,
    "RandomCrop": RandomCrop,
    "RobustNorm": RobustNorm,
}


def build_transform(name: str, **kwargs):
    """Explicit registry lookup — replaces the reference's
    ``eval(name)(**kwargs)`` stringly-typed construction
    (base_dataset.py:190-195)."""
    try:
        return TRANSFORM_REGISTRY[name](**kwargs)
    except KeyError:
        raise RegistryError(
            f"Unknown transform {name!r}; have {sorted(TRANSFORM_REGISTRY)}")
