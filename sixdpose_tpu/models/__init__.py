"""Model-level APIs: template-matching detector, template bank, ICP refiner."""

from sixdpose_tpu.models.templates import TemplateBank, extract_template
from sixdpose_tpu.models.detector import Detector, Match
from sixdpose_tpu.models.refine import PoseRefiner, refine_poses

__all__ = [
    "TemplateBank",
    "extract_template",
    "Detector",
    "Match",
    "PoseRefiner",
    "refine_poses",
]
