"""Host-side data pipelines and fixtures."""

from .mmnist import load_mmnist, mmnist_paths
from .pipeline import ArrayDataset, GeneratorDataset, device_prefetch
from .synthetic import bouncing_blobs, write_mmnist_fixture

__all__ = [
    "load_mmnist",
    "mmnist_paths",
    "ArrayDataset",
    "GeneratorDataset",
    "device_prefetch",
    "bouncing_blobs",
    "write_mmnist_fixture",
]
