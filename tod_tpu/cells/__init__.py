from tod_tpu.cells.types import MatchSet, PoseResult
from tod_tpu.cells.features import (
    FeatureDescriptor,
    DepthTo3d,
    RescaledRegisteredDepth,
)
from tod_tpu.cells.matcher import DescriptorMatcher
from tod_tpu.cells.guess import GuessGenerator
from tod_tpu.cells.trainer import Trainer, ModelFiller
from tod_tpu.cells.readers import ModelReader, ModelReaderIterative, ModelWriter
from tod_tpu.cells.io import (
    Aggregator,
    Constant,
    Dealer,
    DatasetSource,
    PassthroughN,
    Publisher,
)

__all__ = [
    "MatchSet", "PoseResult",
    "FeatureDescriptor", "DepthTo3d", "RescaledRegisteredDepth",
    "DescriptorMatcher", "GuessGenerator",
    "Trainer", "ModelFiller",
    "ModelReader", "ModelReaderIterative", "ModelWriter",
    "Aggregator", "Constant", "Dealer", "DatasetSource", "PassthroughN",
    "Publisher",
]
