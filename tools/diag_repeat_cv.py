"""Same repeatability test with cv2.ORB — is the sensitivity intrinsic to
the texture (smooth synthetic noise) or specific to our implementation?"""
import os, sys
import numpy as np, cv2
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tod_tpu.utils.synthetic import DEFAULT_K, SyntheticObject, render_plane

obj = SyntheticObject.make("r", seed=77)
K = DEFAULT_K

def render(Rz_deg=0.0, tilt_deg=0.0, z=0.8):
    az = np.radians(Rz_deg); tx = np.radians(tilt_deg)
    Rz = np.array([[np.cos(az), -np.sin(az), 0], [np.sin(az), np.cos(az), 0], [0, 0, 1]])
    Rx = np.array([[1, 0, 0], [0, np.cos(tx), -np.sin(tx)], [0, np.sin(tx), np.cos(tx)]])
    R = Rx @ Rz; T = np.array([0.0, 0.0, z])
    canvas, depth, mask = render_plane(obj.texture, obj.size_m, R, T, K, (480, 640))
    return canvas, R, T

orb = cv2.ORB_create(nfeatures=800, nlevels=3, scaleFactor=1.2)
def features(img):
    kps, desc = orb.detectAndCompute(img, None)
    xy = np.asarray([k.pt for k in kps], np.float32)
    return xy, desc.astype(np.uint8)

base, R0, T0 = render()
xy0, d0 = features(base)
from scipy.spatial import cKDTree
def corresp(name, img, R1, T1):
    xy1, d1 = features(img)
    rays = np.concatenate([(xy0 - [K[0,2], K[1,2]]) / [K[0,0], K[1,1]], np.ones((len(xy0),1))], 1)
    lam = (R0.T @ T0)[2] / (rays @ R0[:, 2])
    obj_pts = (rays * lam[:, None] - T0) @ R0
    cam1 = obj_pts @ R1.T + T1
    pix1 = (cam1 @ K.T); pix1 = pix1[:, :2] / pix1[:, 2:3]
    tree = cKDTree(xy1)
    dd, ii = tree.query(pix1, k=1)
    ok = dd < 2.0
    b0 = np.unpackbits(d0[ok], axis=1)
    b1 = np.unpackbits(d1[ii[ok]], axis=1)
    h = (b0 != b1).sum(1)
    print(f"cv2 {name}: n={int(ok.sum())} hamming p25/50/75 = {np.percentile(h, [25,50,75])}")

img, R1, T1 = render(); corresp("identical      ", img, R1, T1)
img, R1, T1 = render(Rz_deg=30); corresp("rot 30 in-plane", img, R1, T1)
img, R1, T1 = render(tilt_deg=25); corresp("tilt 25        ", img, R1, T1)
img, R1, T1 = render(z=1.0); corresp("scale 0.8->1.0 ", img, R1, T1)
