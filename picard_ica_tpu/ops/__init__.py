"""Compute kernels: densities, linalg, whitening, moment contractions."""

from . import densities, linalg, moments, whitening

__all__ = ["densities", "linalg", "moments", "whitening"]
