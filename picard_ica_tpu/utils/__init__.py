"""Evaluation metrics, synthetic data generation, profiling."""

from . import datagen, metrics, profiling
from .datagen import generate_bench_data, generate_mixed_kurtosis_data, generate_test_data
from .metrics import amari_distance, check_density, permute
from .profiling import fit_with_timing, profile_fit

__all__ = [
    "datagen",
    "metrics",
    "profiling",
    "amari_distance",
    "permute",
    "check_density",
    "generate_bench_data",
    "generate_test_data",
    "generate_mixed_kurtosis_data",
    "fit_with_timing",
    "profile_fit",
]
