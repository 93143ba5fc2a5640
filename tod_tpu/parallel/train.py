"""Multi-chip training step: turntable views sharded over 'data'.

The training pipeline's hot loop — ORB + keypoint validation + 3D
back-projection + camera->world per observation (Trainer.cpp:134-181) — is
view-independent, so the full training step for one object is a vmap over the
view batch, sharded along the 'data' mesh axis. The merge (mergePoints) is a
host-side concatenation of the valid rows after the device step.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tod_tpu.geometry.transforms import camera_to_world
from tod_tpu.ops.depth import depth_to_3d_sparse
from tod_tpu.ops.image import rgb_to_gray
from tod_tpu.ops.morphology import validate_keypoints
from tod_tpu.ops.orb import orb_detect_and_compute


def train_views_step(grays: jax.Array, masks: jax.Array, depths_m: jax.Array,
                     Ks: jax.Array, Rs: jax.Array, Ts: jax.Array,
                     n_features: int = 1000, n_levels: int = 3,
                     scale_factor: float = 1.2,
                     fast_threshold: float = 20.0,
                     feature_type: str = "ORB",
                     subpixel: bool = False) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched per-view model building: (V,H,W) grays/masks/depths ->
    (V,K,D) descriptors (u8 ORB bits or f32 SIFT), (V,K,3) world points,
    (V,K) valid.

    ``subpixel`` (ORB only): refine keypoint coords by parabola fitting and
    back-project model points through the FRACTIONAL pixel ray. Off by
    default — the reference snaps training keypoints to integers
    (training.cpp:88-102), and detection-side subpixel only helps when both
    sides opt in (ops/orb.py)."""
    if feature_type == "SIFT":
        from tod_tpu.ops.sift import sift_detect_and_compute as detect

        extra = {}
    else:
        detect = orb_detect_and_compute
        extra = {"subpixel": subpixel}

    def one_view(gray, mask, depth_m, K, R, T):
        kps, desc = detect(
            gray, n_features=n_features, n_levels=n_levels,
            scale_factor=scale_factor, fast_threshold=fast_threshold,
            mask=mask, **extra)
        val = validate_keypoints(kps.xy, kps.valid, mask, depth_m)
        coords = val.xy.astype(jnp.float32)
        if subpixel and feature_type != "SIFT":
            # keep the sub-pixel fraction on top of the mask-snapped integer
            # coordinate (depth is still read at the integer pixel)
            coords = coords + (kps.xy - jnp.round(kps.xy))
        cam_pts = depth_to_3d_sparse(depth_m, K, coords)
        world = camera_to_world(R, T, cam_pts)
        return desc, world, val.valid

    return jax.vmap(one_view)(grays, masks, depths_m, Ks, Rs, Ts)


def train_views_sharded(mesh: Mesh, n_features: int = 1000,
                        n_levels: int = 3, scale_factor: float = 1.2,
                        subpixel: bool = False):
    """jit the training step with the view batch sharded over 'data'."""
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    fn = functools.partial(train_views_step, n_features=n_features,
                           n_levels=n_levels, scale_factor=scale_factor,
                           subpixel=subpixel)
    return jax.jit(fn, in_shardings=(data, data, data, data, data, data),
                   out_shardings=(data, data, data))
