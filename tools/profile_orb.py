"""ORB sub-stage profile with hard syncs."""
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

from tod_tpu.ops.fast import fast_score, harris_response, select_topk_keypoints
from tod_tpu.ops.image import build_pyramid, gaussian_blur
from tod_tpu.ops.orb import brief_descriptors, keypoint_angles, orb_detect_and_compute

rng = np.random.default_rng(0)
gray = jnp.asarray(rng.uniform(0, 255, (480, 640)), jnp.float32)


def bench(name, fn, args, probe, n=15):
    out = fn(*args)
    np.asarray(probe(out))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        np.asarray(probe(out))
    print(f"{name:28s} {(time.time()-t0)/n*1e3:8.2f} ms", flush=True)
    return out


bench("rtt", jax.jit(lambda x: x + 1), (jnp.zeros(8),), lambda o: o)

dense = jax.jit(lambda g: [
    (lambda s: (s[0], harris_response(lvl)))(fast_score(lvl, 20.0))
    for lvl in build_pyramid(g, 3, 1.2)][0])
bench("pyramid+fast+harris (3 lv)", dense, (gray,), lambda o: o[0][:2, :2])


def sel(g):
    outs = []
    for lvl, k in zip(build_pyramid(g, 3, 1.2), (1827, 1522, 1651)):
        score, is_c = fast_score(lvl, 20.0)
        h = harris_response(lvl)
        outs.append(select_topk_keypoints(score, h, is_c, k))
    return outs


jsel = jax.jit(sel)
bench("+ topk select", jsel, (gray,), lambda o: o[0][0][:4])


def orient(g):
    lvl = build_pyramid(g, 3, 1.2)[0]
    score, is_c = fast_score(lvl, 20.0)
    h = harris_response(lvl)
    xy, _, _ = select_topk_keypoints(score, h, is_c, 1827)
    return keypoint_angles(lvl, xy)


bench("orientation (lv0)", jax.jit(orient), (gray,), lambda o: o[:4])


def brief(g):
    lvl = build_pyramid(g, 3, 1.2)[0]
    score, is_c = fast_score(lvl, 20.0)
    h = harris_response(lvl)
    xy, _, _ = select_topk_keypoints(score, h, is_c, 1827)
    ang = keypoint_angles(lvl, xy)
    return brief_descriptors(gaussian_blur(lvl), xy, ang)


bench("+ blur + brief (lv0)", jax.jit(brief), (gray,), lambda o: o[:4])

full = jax.jit(lambda g: orb_detect_and_compute(g, n_features=5000,
                                                n_levels=3,
                                                scale_factor=1.2))
bench("full ORB", full, (gray,), lambda o: o[1][:4])
