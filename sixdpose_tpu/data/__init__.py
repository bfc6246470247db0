"""Dataset I/O and registry (reference: pysixd/inout.py, params/dataset_params.py)."""

from sixdpose_tpu.data import inout
from sixdpose_tpu.data.datasets import get_dataset_params

__all__ = ["inout", "get_dataset_params"]
