"""tod_tpu — a TPU-native (JAX/XLA/Pallas/pjit) textured-object-detection framework.

A from-scratch rebuild of the capabilities of ORK's Textured Object Detection
(wg-perception/tod): train per-object descriptor models from turntable RGB-D
observations, then detect objects and estimate 6-DoF poses in live RGB-D frames.

Layering (bottom-up; see SURVEY.md section 7):
  ops/       feature + matching kernels (jnp + Pallas), static shapes, MXU-first
  native/    C++ components (exact max-clique, CPU Hamming baseline, plasm core)
  geometry/  adjacency graphs, graph-constrained RANSAC, rigid pose estimation
  db/        document store (in-memory / filesystem / CouchDB-compatible HTTP)
  pipeline/  cell/plasm/BlackBox dataflow API + .ork YAML loader
  cells/     Trainer / DescriptorMatcher / GuessGenerator / ... cells
  models/    TodTrainer / TodDetector pipelines + the fused jitted detector
  parallel/  device-mesh sharding of matching and detection (pjit/shard_map)
"""

import os as _os

# The axon TPU plugin re-asserts its platform over the JAX_PLATFORMS env var;
# make the documented env contract hold when the user asks for the CPU
# backend (tests/CLIs set JAX_PLATFORMS=cpu). Other values stay with the
# plugin's own resolution (config-updating 'axon' pre-registration breaks it).
if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

from tod_tpu.utils.config import merge_dict

__version__ = "0.1.0"

__all__ = ["merge_dict", "__version__"]
