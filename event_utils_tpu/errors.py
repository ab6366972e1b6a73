"""Structured error taxonomy (SURVEY.md §5.3 failure detection).

The reference library signals failure through bare ``ValueError``/
``Exception`` raises and, in several places, silent fallbacks
(e.g. /root/reference/lib/data_loaders/base_dataset.py:69-75 aborts with
``raise Exception`` strings). This module gives the framework one typed
hierarchy so callers can distinguish *what kind* of failure occurred —
bad configuration, data problems, or hardware-formulation limits — and
handle each programmatically.

Every class also subclasses the builtin exception the site historically
raised (``ValueError``, ``KeyError``, ``FileNotFoundError``,
``RuntimeError``), so pre-existing ``except ValueError`` call sites keep
working: the taxonomy is strictly additive.

Hierarchy::

    EventUtilsError
    ├── ConfigurationError (ValueError)    bad arguments / options / shapes
    │   ├── SensorLimitError               sensor/VMEM formulation limits
    │   └── RegistryError (KeyError)       unknown name in a registry
    ├── DataError
    │   ├── DataNotFoundError (FileNotFoundError)
    │   ├── DataFormatError (ValueError)   inconsistent / corrupt data
    │   └── DatasetInitError (RuntimeError) loader postcondition violated
    └── NativeBuildError (RuntimeError)    native toolchain / library failure
"""

from __future__ import annotations


class EventUtilsError(Exception):
    """Base class of every error raised by event_utils_tpu."""


class ConfigurationError(EventUtilsError, ValueError):
    """Invalid arguments, options, or shapes supplied by the caller."""


class SensorLimitError(ConfigurationError):
    """The requested sensor size / bin count exceeds a kernel formulation
    limit (e.g. the one-hot matmul working set does not fit VMEM)."""


class RegistryError(ConfigurationError, KeyError):
    """Unknown name looked up in an object registry (objectives, warps,
    transforms, visualizers).

    Subclasses ``KeyError`` (registries are mappings) *and*
    ``ConfigurationError`` (the name is caller-supplied configuration).
    ``str()`` is overridden because ``KeyError`` repr-quotes its message.
    """

    def __str__(self):  # KeyError would repr() the message
        return Exception.__str__(self)


class DataError(EventUtilsError):
    """Problems with event data files or their contents."""


class DataNotFoundError(DataError, FileNotFoundError):
    """An expected data file / directory / in-file dataset is missing."""


class DataFormatError(DataError, ValueError):
    """Data exists but is inconsistent or malformed (mismatched component
    lengths, wrong dtypes/shapes for a zero-copy write, ...)."""


class DatasetInitError(DataError, RuntimeError):
    """A dataset loader completed without establishing its required members
    (``sensor_resolution``, ``t0``/``tk``, ...) — the loader subclass is
    faulty or the file is missing required metadata."""


class NativeBuildError(EventUtilsError, RuntimeError):
    """The native (C++) runtime could not be built or loaded."""
