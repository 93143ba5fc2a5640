from tod_tpu.parallel.mesh import make_mesh
from tod_tpu.parallel.matching import (ring_hamming_topk,
                                       sharded_hamming_topk)
from tod_tpu.parallel.detect import detect_batch_sharded
from tod_tpu.parallel.train import train_views_sharded
from tod_tpu.parallel.segmented import (pack_segmented_sharded,
                                        sharded_object_top1)

__all__ = ["make_mesh", "sharded_hamming_topk", "ring_hamming_topk",
           "detect_batch_sharded", "train_views_sharded",
           "pack_segmented_sharded", "sharded_object_top1",
           "ShardedServingDetector"]
from tod_tpu.parallel.pipeline import PipelinedDetector  # noqa: E402,F401
from tod_tpu.parallel.serving import ShardedServingDetector  # noqa: E402,F401
