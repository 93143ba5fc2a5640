from tod_tpu.models.detector import TodDetector
from tod_tpu.models.trainer import TodTrainer
from tod_tpu.models.fused import FusedDetector, FusedDetectorConfig

__all__ = ["TodDetector", "TodTrainer", "FusedDetector",
           "FusedDetectorConfig"]
