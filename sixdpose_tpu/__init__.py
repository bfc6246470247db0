"""sixdpose_tpu — a TPU-native 6D object pose estimation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of meiqua/6DPose:

- ``models.detector``   — quantized-feature template matching ("linemodLevelup"
  in the reference, /root/reference/linemodLevelup/linemodLevelup.cpp) rebuilt
  as dense MXU correlation over orientation response maps.
- ``models.refine``     — batched point-to-plane ICP pose refinement
  (reference: poseRefine, linemodLevelup.cpp:27-170) as a Gauss-Newton solve.
- ``geometry``          — view-sphere sampling, transforms, a JAX depth
  rasterizer (reference: pysixd/renderer.py, view_sampler.py, transform.py).
- ``eval``              — VSD/ADD/ADI/COU/re/te pose errors and SIXD-2017
  evaluation (reference: pysixd/pose_error.py, tools/eval_*.py).
- ``lchf``              — Latent-Class Hough Forest (reference: cxxLCHF/).
- ``seg``               — depth-adaptive superpixels + convex grouping
  (reference: cxx_3d_seg/).
- ``parallel``          — jax.sharding mesh utilities: data/template/tile
  sharding of the matching pipeline (no reference equivalent; the reference
  is single-threaded SSE).

The import name is ``sixdpose_tpu`` ("6dpose_tpu" is not a valid Python
identifier).
"""

__version__ = "0.1.0"

from sixdpose_tpu import config as config

__all__ = ["config", "__version__"]
