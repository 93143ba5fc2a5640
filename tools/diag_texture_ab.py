"""A/B: descriptor repeatability on the current smooth textures vs a
high-contrast 'product-like' texture (sharp edges, glyphs, posterized)."""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np, cv2
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from tod_tpu.ops.orb import orb_detect_and_compute
from tod_tpu.utils.synthetic import DEFAULT_K, render_plane
from scipy.spatial import cKDTree

def make_texture_sharp(seed, size=384):
    rng = np.random.default_rng(seed)
    # posterized multi-octave base: flat regions with crisp boundaries
    acc = np.zeros((size, size), np.float32)
    for cells, weight in ((5, 1.0), (11, 0.7), (23, 0.5)):
        layer = rng.normal(size=(cells, cells)).astype(np.float32)
        acc += weight * cv2.resize(layer, (size, size), interpolation=cv2.INTER_LINEAR)
    levels = np.quantile(acc, [0.25, 0.5, 0.75])
    tex = np.full((size, size), 40, np.uint8)
    shades = [40, 110, 180, 235]
    idx = np.digitize(acc, levels)
    for i, s in enumerate(shades):
        tex[idx == i] = s
    # high-contrast glyph/shape layer
    for _ in range(90):
        shade = int(rng.choice([0, 255, 70, 200]))
        x, y = rng.integers(8, size - 8, 2)
        kind = rng.integers(0, 5)
        if kind == 0:
            w, h = rng.integers(5, 28, 2)
            cv2.rectangle(tex, (int(x), int(y)), (int(min(x+w, size-1)), int(min(y+h, size-1))), shade, -1)
        elif kind == 1:
            cv2.circle(tex, (int(x), int(y)), int(rng.integers(3, 14)), shade, -1)
        elif kind == 2:
            x2, y2 = rng.integers(8, size - 8, 2)
            cv2.line(tex, (int(x), int(y)), (int(x2), int(y2)), shade, int(rng.integers(2, 4)))
        elif kind == 3:
            pts = np.stack([rng.integers(max(x-22,0), min(x+22,size), 3),
                            rng.integers(max(y-22,0), min(y+22,size), 3)], -1).astype(np.int32)
            cv2.fillPoly(tex, [pts], shade)
        else:  # text-like glyph
            txt = chr(int(rng.integers(33, 126)))
            cv2.putText(tex, txt, (int(x), int(y)), cv2.FONT_HERSHEY_SIMPLEX,
                        float(rng.uniform(0.5, 1.4)), shade, 2)
    return tex

K = DEFAULT_K
def run_ab(tex, name):
    def render(Rz_deg=0.0, tilt_deg=0.0, z=0.8):
        az = np.radians(Rz_deg); tx = np.radians(tilt_deg)
        Rz = np.array([[np.cos(az), -np.sin(az), 0], [np.sin(az), np.cos(az), 0], [0, 0, 1]])
        Rx = np.array([[1, 0, 0], [0, np.cos(tx), -np.sin(tx)], [0, np.sin(tx), np.cos(tx)]])
        R = Rx @ Rz; T = np.array([0.0, 0.0, z])
        canvas, depth, mask = render_plane(tex, 0.24, R, T, K, (480, 640))
        return canvas.astype(np.float32), R, T
    def features(img):
        kps, desc = orb_detect_and_compute(jnp.asarray(img), n_features=800)
        v = np.asarray(kps.valid)
        return np.asarray(kps.xy)[v], np.asarray(desc)[v]
    base, R0, T0 = render()
    xy0, d0 = features(base)
    def corresp(tag, img, R1, T1):
        xy1, d1 = features(img)
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
        print(f"{name} {tag}: n={int(ok.sum())} p25/50/75 = {np.percentile(h, [25,50,75])}")
    img, R1, T1 = render(Rz_deg=30); corresp("rot30 ", img, R1, T1)
    img, R1, T1 = render(tilt_deg=25); corresp("tilt25", img, R1, T1)
    img, R1, T1 = render(z=1.0); corresp("scale ", img, R1, T1)

from tod_tpu.utils.synthetic import make_texture
run_ab(make_texture(77), "smooth")
run_ab(make_texture_sharp(77), "sharp ")
