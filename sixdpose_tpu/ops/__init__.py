"""TPU-native compute ops for the matching pipeline.

Pipeline (reference: Detector::match, linemodLevelup.cpp:1702-1777):

    quantize  ->  spread  ->  response maps  ->  dense similarity  ->  top-K

Each stage here is a jit-compatible function over whole images; the
reference's SSE "linear memory" trick (linemodLevelup.cpp:1215-1243) is
replaced by formulating similarity as a strided correlation that XLA tiles
onto the MXU (see ops/similarity.py).
"""

from sixdpose_tpu.ops.quantize import (
    quantize_color_gradient,
    quantize_depth_normal,
    color_gradient_pyramid,
    pyr_down_rgb,
    pyr_down_depth,
)
from sixdpose_tpu.ops.spread import spread_orientations, compute_response_maps
from sixdpose_tpu.ops.similarity import (
    similarity_dense,
    similarity_local,
    score_normalize,
)

__all__ = [
    "quantize_color_gradient",
    "quantize_depth_normal",
    "color_gradient_pyramid",
    "pyr_down_rgb",
    "pyr_down_depth",
    "spread_orientations",
    "compute_response_maps",
    "similarity_dense",
    "similarity_local",
    "score_normalize",
]
