"""Simulate geometric activation offline: per-object top-1 matches for all
100 objects on several scenes -> cheap RANSAC-lite presence score per object
-> check present/absent separation. Dumps match data to /tmp on first run."""
import os
import sys

sys.path.insert(0, ".")
import numpy as np

os.environ.setdefault("BENCH_DB_CACHE", "/tmp/bench_cache")

DUMP = "/tmp/diag_act_data.npz"
N_SCENES = int(os.environ.get("DIAG_SCENES", "4"))

if not os.path.exists(DUMP):
    import jax
    import jax.numpy as jnp
    from bench import build_db
    from tod_tpu.models import FusedDetector, FusedDetectorConfig
    from tod_tpu.geometry.detection import GuessConfig
    from tod_tpu.geometry.ransac import RansacConfig
    from tod_tpu.ops.matching import hamming_topk
    from tod_tpu.utils.synthetic import DEFAULT_K, compose_scene, facing_pose

    N = 100
    objects, models = build_db(N)
    cfg = FusedDetectorConfig(n_features=5000,
                              guess=GuessConfig(ransac=RansacConfig()))
    det = FusedDetector(models, cfg)
    s1, _, _ = det._stages
    rmax_pad = -(-max(m.n_points for m in models) // 2048) * 2048
    db_all = np.zeros((N, rmax_pad, 32), np.uint8)
    nv = np.zeros(N, np.int32)
    pts_all = np.zeros((N, rmax_pad, 3), np.float32)
    for i, m in enumerate(models):
        db_all[i, :m.n_points] = m.descriptors
        pts_all[i, :m.n_points] = m.points
        nv[i] = m.n_points
    db_j = jnp.asarray(db_all)
    nv_j = jnp.asarray(nv)
    match1 = jax.jit(jax.vmap(
        lambda q, db, n: hamming_topk(q, db, n, k=1, chunk=2048),
        in_axes=(None, 0, 0)))

    rng = np.random.default_rng(7)
    out = {}
    spans = np.asarray(det.db.spans)
    for s in range(N_SCENES):
        trio = [objects[(3 * s + j) % len(objects)] for j in range(3)]
        poses = [facing_pose(rng, z=0.75), facing_pose(rng, z=0.9),
                 facing_pose(rng, z=1.05)]
        poses[0][1][0] = -0.22
        poses[1][1][0] = 0.02
        poses[2][1][0] = 0.24
        image, depth = compose_scene(trio, poses)
        gray, depth_j, K_j = det.prepare_frame(image, depth, DEFAULT_K)
        kps, desc, query_pts = s1(gray, depth_j, K_j)
        d, i = match1(desc, db_j, nv_j)
        out[f"d{s}"] = np.asarray(d)[:, :, 0].astype(np.int16)
        out[f"i{s}"] = np.asarray(i)[:, :, 0].astype(np.int32)
        out[f"q{s}"] = np.asarray(query_pts)
        out[f"xy{s}"] = np.asarray(kps.xy)
        out[f"v{s}"] = np.asarray(kps.valid)
        out[f"gtidx{s}"] = np.asarray([3 * s + j for j in range(3)]) % N
        out[f"gtR{s}"] = np.stack([p[0] for p in poses])
        out[f"gtT{s}"] = np.stack([p[1] for p in poses])
        print(f"scene {s} matched", flush=True)
    out["pts"] = pts_all
    out["spans"] = spans
    np.savez_compressed(DUMP, **out)
    print("dumped", flush=True)

data = np.load(DUMP)
pts_all = data["pts"]
spans = data["spans"]
N = pts_all.shape[0]
SIGMA = 0.01
rngs = np.random.default_rng(0)


def activation_score(qp, tp, xy, span, cap=256, n_hyp=256):
    """RANSAC-lite: top-`cap` by distance assumed pre-selected; returns the
    best inlier count over `n_hyp` graph-constrained triples."""
    M = len(qp)
    if M < 3:
        return 0
    dq = np.linalg.norm(qp[:, None] - qp[None], axis=-1)
    dt = np.linalg.norm(tp[:, None] - tp[None], axis=-1)
    dpix = np.linalg.norm(xy[:, None] - xy[None], axis=-1)
    phys = (np.abs(dt - dq) <= 4 * SIGMA) & (dq <= (span + 2 * SIGMA))
    samp = phys & (dpix > 20) & (np.abs(dt - dq) < 2 * SIGMA)
    np.fill_diagonal(phys, False)
    np.fill_diagonal(samp, False)
    deg = samp.sum(1)
    ok = deg >= 3
    if ok.sum() < 3:
        return 0
    best = 0
    idx_ok = np.nonzero(ok)[0]
    for _ in range(n_hyp):
        v1 = rngs.choice(idx_ok)
        n1 = np.nonzero(samp[v1])[0]
        if len(n1) == 0: continue
        v2 = rngs.choice(n1)
        n2 = np.nonzero(samp[v1] & samp[v2])[0]
        if len(n2) == 0: continue
        v3 = rngs.choice(n2)
        # candidate inliers: common physical neighbors with residual test
        cand = phys[v1] & phys[v2] & phys[v3]
        cand[[v1, v2, v3]] = True
        # Horn fit
        A = qp[[v1, v2, v3]]; B = tp[[v1, v2, v3]]
        ca, cb = A.mean(0), B.mean(0)
        H = (A - ca).T @ (B - cb)
        U, S, Vt = np.linalg.svd(H)
        D = np.diag([1, 1, np.sign(np.linalg.det(Vt.T @ U.T))])
        R = Vt.T @ D @ U.T
        t = cb - R @ ca
        res = np.linalg.norm(qp @ R.T + t - tp, axis=1)
        inl = cand & (res < SIGMA)
        best = max(best, int(inl.sum()))
    return best


for s in range(N_SCENES):
    if f"d{s}" not in data:
        break
    d = data[f"d{s}"]; i = data[f"i{s}"]
    qp = data[f"q{s}"]; xy = data[f"xy{s}"]; v = data[f"v{s}"]
    present = set(data[f"gtidx{s}"].tolist())
    q_fin = np.isfinite(qp).all(-1) & v
    scores = np.zeros(N, np.int32)
    for o in range(N):
        keep = (d[o] <= 50) & q_fin
        sel = np.nonzero(keep)[0]
        if len(sel) > 256:
            sel = sel[np.argsort(d[o][sel])[:256]]
        tp = pts_all[o][np.maximum(i[o][sel], 0)]
        scores[o] = activation_score(qp[sel], tp, xy[sel], spans[o])
    order = np.argsort(-scores)
    in16 = sum(1 for o in order[:16] if o in present)
    pr = {int(o): int(scores[o]) for o in sorted(present)}
    ab = np.sort(scores[[o for o in range(N) if o not in present]])
    print(f"scene {s}: present={pr} absent med/p90/max="
          f"{ab[len(ab)//2]}/{ab[int(len(ab)*.9)]}/{ab[-1]} "
          f"top16 {in16}/3  top8 {sum(1 for o in order[:8] if o in present)}/3",
          flush=True)
