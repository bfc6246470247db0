"""Configuration dataclasses.

The reference scatters its knobs across C++ default constructors and
hand-edited driver variables (see SURVEY.md §5 "Config / flag system"):
ColorGradient(10, 63, 55) and DepthNormal(2000, 50, 63, 2) defaults at
linemodLevelup.cpp:645-650 and :968-974, the T-pyramid {5, 8} at :1663-1672,
and Detector(150, [4, 8]) in linemod_and_levelup_test.py:19.  Here every knob
is an explicit frozen dataclass so configs hash and can key jit caches.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class ColorGradientConfig:
    """Color-gradient modality (reference: linemodLevelup.cpp:645-650)."""

    weak_threshold: float = 10.0     # gradient magnitude gate for quantization
    strong_threshold: float = 55.0   # magnitude gate for template features
    num_features: int = 63           # features per template at level 0


@dataclasses.dataclass(frozen=True)
class DepthNormalConfig:
    """Depth-normal modality (reference: linemodLevelup.cpp:968-974)."""

    distance_threshold: int = 2000    # ignore depth beyond this (mm)
    difference_threshold: int = 50    # bilateral depth-difference gate (mm)
    num_features: int = 63
    extract_threshold: int = 2        # distance-transform score gate
    focal: float = 1150.0             # reference hard-codes 1150 (cpp:781-783)
    lut_parity: bool = False          # emulate NORMAL_LUT's 20-grid
    #                                   truncation bit-exactly (default:
    #                                   continuous azimuth, strictly more
    #                                   accurate; see ops/quantize.py)


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """Template-matching detector.

    ``t_at_level`` is the sampling step per pyramid level, coarse level last
    (reference T_at_level, linemodLevelup.cpp:1663-1672; drivers use
    (4, 8) at linemod_and_levelup_test.py:19).
    """

    t_at_level: Tuple[int, ...] = (4, 8)
    max_features: int = 63           # per modality per template at level 0
    color: ColorGradientConfig = ColorGradientConfig()
    depth: DepthNormalConfig = DepthNormalConfig()
    use_color: bool = True
    use_depth: bool = True
    # Dense-scoring parameters (TPU design; no reference analog)
    top_k: int = 128                 # candidates kept after coarse scoring
    nms_iou: float = 0.5             # box-NMS IoU for final dedupe
    # Response LUT variant. "levelup" = the active reference LUT
    # ("1,2->0, 3->1", linemodLevelup.cpp:1121): exact bit -> 4,
    # adjacent (45 deg) -> 1, else 0.  "stock" = original LINEMOD
    # (4,3,2,1 taper, commented LUT at cpp:1112).
    response_lut: str = "levelup"

    @property
    def pyramid_levels(self) -> int:
        return len(self.t_at_level)

    @property
    def num_modalities(self) -> int:
        return int(self.use_color) + int(self.use_depth)


@dataclasses.dataclass(frozen=True)
class IcpConfig:
    """Batched point-to-plane ICP (reference: poseRefine, cpp:27-170)."""

    max_iters: int = 20
    corr_dist: float = 0.01          # correspondence gate, meters (cpp:31)
    num_model_points: int = 1024     # fixed sample of model points
    voxel_size: float = 0.0025       # reference voxel downsample (cpp:106)
    dilate_px: int = 4               # model mask dilation (cpp:45-46)
    anchor_window: float = 0.4       # scene-centroid depth window, m (cpp:93)
    coarse_gate_mult: float = 3.0    # gate schedule: starts at mult*corr_dist,
    #                                  decays geometrically to corr_dist by the
    #                                  last iteration (coarse->fine re-gating)
    color_weight: float = 0.1        # colored-ICP term weight (0 disables);
    #                                  engages when model clouds carry colors
    chroma_scale: float = 0.05       # meters per unit chroma residual
    point_weight: float = 0.2        # point-to-point blend (pins the
    #                                  in-plane null space of projective
    #                                  point-to-plane; flat over [0.05,0.5])
    lm_damping: float = 1e-3         # Levenberg-Marquardt diagonal damping
    bilinear_iters: int = 8          # final iterations with bilinear
    #                                  association (earlier: nearest-tap).
    #                                  Swept on the synthetic bench:
    #                                  (8, 256) matches full-bilinear
    #                                  recall exactly at 1.13 s vs 1.73 s
    #                                  device/frame; (4, 128) loses the
    #                                  wedge's flip-seed rescue (-2 hits).
    coarse_points: int = 256         # strided cloud subset for the early
    #                                  nearest-tap phase (full cloud after)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """JAX depth rasterizer (replaces pysixd/renderer.py OpenGL)."""

    clip_near: float = 100.0         # mm (pose_error.py:35)
    clip_far: float = 10000.0        # mm
    tile_px: int = 16                # rasterization tile per triangle


@dataclasses.dataclass(frozen=True)
class VsdConfig:
    """SIXD-2017 VSD protocol (tools/eval_calc_errors.py:34-42)."""

    delta: float = 15.0
    tau: float = 20.0
    cost_type: str = "step"
    threshold: float = 0.3
    visib_gt_min: float = 0.1


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for sharded matching (SURVEY.md §2.5)."""

    data: int = 1                    # batch of scenes (DP)
    template: int = 1                # template-bank shards (TP analog)
    tile: int = 1                    # image-tile shards (SP analog)
