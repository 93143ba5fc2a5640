"""Decompose descriptor flip sources under a 30deg in-plane rotation:
position offset, orientation-estimate error, pyramid level mismatch."""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from tod_tpu.ops.orb import orb_detect_and_compute
from tod_tpu.utils.synthetic import DEFAULT_K, make_texture, render_plane
from scipy.spatial import cKDTree

K = DEFAULT_K; tex = make_texture(77)
def render(Rz_deg=0.0, z=0.8):
    az = np.radians(Rz_deg)
    R = np.array([[np.cos(az), -np.sin(az), 0], [np.sin(az), np.cos(az), 0], [0, 0, 1]])
    T = np.array([0.0, 0.0, z])
    canvas, _, _ = render_plane(tex, 0.24, R, T, K, (480, 640))
    return canvas.astype(np.float32), R, T
def features(img):
    kps, desc = orb_detect_and_compute(jnp.asarray(img), n_features=800)
    v = np.asarray(kps.valid)
    return (np.asarray(kps.xy)[v], np.asarray(desc)[v],
            np.asarray(kps.angle)[v], np.asarray(kps.level)[v])

base, R0, T0 = render()
xy0, d0, a0, l0 = features(base)
img, R1, T1 = render(Rz_deg=30)
xy1, d1, a1, l1 = features(img)
rays = np.concatenate([(xy0 - [K[0,2], K[1,2]]) / [K[0,0], K[1,1]], np.ones((len(xy0),1))], 1)
lam = (R0.T @ T0)[2] / (rays @ R0[:, 2])
obj_pts = (rays * lam[:, None] - T0) @ R0
cam1 = obj_pts @ R1.T + T1
pix1 = (cam1 @ K.T); pix1 = pix1[:, :2] / pix1[:, 2:3]
tree = cKDTree(xy1)
dd, ii = tree.query(pix1, k=1)
ok = dd < 2.0
b0 = np.unpackbits(d0[ok].astype(np.uint8), axis=1)
b1 = np.unpackbits(d1[ii[ok]].astype(np.uint8), axis=1)
h = (b0 != b1).sum(1)
pos_err = dd[ok]
ang_err = np.degrees(np.mod(a1[ii[ok]] - a0[ok] + np.radians(30) + np.pi, 2*np.pi) - np.pi)
lvl_same = l0[ok] == l1[ii[ok]]
print("angle err (deg) p25/50/75:", np.percentile(np.abs(ang_err), [25,50,75]).round(1))
print("level same frac:", lvl_same.mean().round(2))
for name, m in (("pos<0.5px", pos_err < 0.5), ("pos>1px", pos_err > 1.0),
                ("|ang err|<3deg", np.abs(ang_err) < 3),
                ("|ang err|>10deg", np.abs(ang_err) > 10),
                ("lvl same", lvl_same), ("lvl diff", ~lvl_same),
                ("pos<0.5 & ang<3 & lvl", (pos_err<0.5)&(np.abs(ang_err)<3)&lvl_same)):
    if m.sum() > 10:
        print(f"{name}: n={int(m.sum())} hamming p25/50/75 = {np.percentile(h[m], [25,50,75])}")
