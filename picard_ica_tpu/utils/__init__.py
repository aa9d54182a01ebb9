"""Evaluation metrics and synthetic data generation."""

from . import datagen, metrics
from .datagen import generate_bench_data, generate_mixed_kurtosis_data, generate_test_data
from .metrics import amari_distance, check_density, permute

__all__ = [
    "datagen",
    "metrics",
    "amari_distance",
    "permute",
    "check_density",
    "generate_bench_data",
    "generate_test_data",
    "generate_mixed_kurtosis_data",
]
