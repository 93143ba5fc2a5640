"""Descriptor repeatability under controlled transforms: same texture
rendered (a) identically, (b) rotated in-plane 30 deg, (c) tilted 25 deg,
(d) scaled 1.25x. Matched keypoints at known corresponding positions ->
Hamming distance of their descriptors. Steered BRIEF should be ~<20 for
(a)/(b); large values isolate which invariance is broken."""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from tod_tpu.ops.orb import orb_detect_and_compute
from tod_tpu.utils.synthetic import DEFAULT_K, SyntheticObject, render_plane, look_at

obj = SyntheticObject.make("r", seed=77)
K = DEFAULT_K

def render(Rz_deg=0.0, tilt_deg=0.0, z=0.8):
    # model->camera pose: in-plane rotation Rz then tilt about x
    az = np.radians(Rz_deg); tx = np.radians(tilt_deg)
    Rz = np.array([[np.cos(az), -np.sin(az), 0], [np.sin(az), np.cos(az), 0], [0, 0, 1]])
    Rx = np.array([[1, 0, 0], [0, np.cos(tx), -np.sin(tx)], [0, np.sin(tx), np.cos(tx)]])
    R = Rx @ Rz
    T = np.array([0.0, 0.0, z])
    canvas, depth, mask = render_plane(obj.texture, obj.size_m, R, T, K, (480, 640))
    return canvas.astype(np.float32), R, T

def features(img):
    kps, desc = orb_detect_and_compute(jnp.asarray(img), n_features=800)
    v = np.asarray(kps.valid)
    return np.asarray(kps.xy)[v], np.asarray(desc)[v], np.asarray(kps.level)[v]

base, R0, T0 = render()
xy0, d0, l0 = features(base)

def corresp(name, img, R1, T1):
    xy1, d1, l1 = features(img)
    # map base pixels -> object plane -> new view pixels
    rays = np.concatenate([ (xy0 - [K[0,2], K[1,2]]) / [K[0,0], K[1,1]], np.ones((len(xy0),1))], 1)
    lam = (R0.T @ T0)[2] / (rays @ R0[:, 2])
    obj_pts = (rays * lam[:, None] - T0) @ R0
    cam1 = obj_pts @ R1.T + T1
    pix1 = (cam1 @ K.T); pix1 = pix1[:, :2] / pix1[:, 2:3]
    # nearest detected keypoint in view1 within 2px
    from scipy.spatial import cKDTree
    tree = cKDTree(xy1)
    dd, ii = tree.query(pix1, k=1)
    ok = dd < 2.0
    if ok.sum() < 20:
        print(f"{name}: only {ok.sum()} correspondences"); return
    b0 = np.unpackbits(d0[ok], axis=1, bitorder="little")
    b1 = np.unpackbits(d1[ii[ok]], axis=1, bitorder="little")
    h = (b0 != b1).sum(1)
    print(f"{name}: n={int(ok.sum())} hamming p25/50/75 = {np.percentile(h, [25,50,75])}")

img, R1, T1 = render()
corresp("identical      ", img, R1, T1)
img, R1, T1 = render(Rz_deg=30)
corresp("rot 30 in-plane", img, R1, T1)
img, R1, T1 = render(Rz_deg=11.25/2)  # half-bin rotation: worst-case binning
corresp("rot 5.6 (half-bin)", img, R1, T1)
img, R1, T1 = render(tilt_deg=25)
corresp("tilt 25        ", img, R1, T1)
img, R1, T1 = render(z=1.0)
corresp("scale 0.8->1.0 ", img, R1, T1)
