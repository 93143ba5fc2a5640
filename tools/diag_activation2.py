"""Sweep tier-1 activation configs offline on the dumped per-object matches:
cap x hypotheses x (uniform | consistency-weighted) sampling. Reports
present scores vs absent quantiles and top-16 membership."""
import sys

sys.path.insert(0, ".")
import numpy as np

data = np.load("/tmp/diag_act_data.npz")
pts_all = data["pts"]
spans = data["spans"]
N = pts_all.shape[0]
SIGMA = 0.01


def score(qp, tp, xy, span, n_hyp, weighted, rngs):
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
    if weighted:
        Af = samp.astype(np.float64)
        w = Af @ (Af @ (Af @ np.ones(M))) + 1e-9
        w = w * (samp.sum(1) >= 3)
    else:
        w = (samp.sum(1) >= 3).astype(np.float64)
    if w.sum() <= 0:
        return 0
    # vectorized triple draws
    p1 = w / w.sum()
    v1 = rngs.choice(M, n_hyp, p=p1)
    best = 0
    for h in range(n_hyp):
        a = v1[h]
        w2 = w * samp[a]
        s2 = w2.sum()
        if s2 <= 0: continue
        b = rngs.choice(M, p=w2 / s2)
        w3 = w2 * samp[b]
        s3 = w3.sum()
        if s3 <= 0: continue
        c = rngs.choice(M, p=w3 / s3)
        cand = phys[a] & phys[b] & phys[c]
        cand[[a, b, c]] = True
        A = qp[[a, b, c]]; B = tp[[a, b, c]]
        ca, cb = A.mean(0), B.mean(0)
        H = (A - ca).T @ (B - cb)
        U, S, Vt = np.linalg.svd(H)
        D = np.diag([1, 1, np.sign(np.linalg.det(Vt.T @ U.T))])
        R = Vt.T @ D @ U.T
        t = cb - R @ ca
        res = np.linalg.norm(qp @ R.T + t - tp, axis=1)
        best = max(best, int((cand & (res < SIGMA)).sum()))
    return best


for cap, n_hyp, weighted in [(256, 256, True), (384, 384, False),
                             (384, 384, True), (512, 512, True)]:
    print(f"--- cap={cap} hyp={n_hyp} weighted={weighted}", flush=True)
    for s in range(4):
        d = data[f"d{s}"]; i = data[f"i{s}"]
        qp = data[f"q{s}"]; xy = data[f"xy{s}"]; v = data[f"v{s}"]
        present = set(data[f"gtidx{s}"].tolist())
        q_fin = np.isfinite(qp).all(-1) & v
        rngs = np.random.default_rng(s)
        scores = np.zeros(N, np.int32)
        for o in range(N):
            keep = (d[o] <= 50) & q_fin
            sel = np.nonzero(keep)[0]
            if len(sel) > cap:
                sel = sel[np.argsort(d[o][sel])[:cap]]
            tp = pts_all[o][np.maximum(i[o][sel], 0)]
            scores[o] = score(qp[sel], tp, xy[sel], spans[o], n_hyp,
                              weighted, rngs)
        order = np.argsort(-scores)
        in16 = sum(1 for o in order[:16] if o in present)
        pr = {int(o): int(scores[o]) for o in sorted(present)}
        ab = np.sort(scores[[o for o in range(N) if o not in present]])
        print(f"  scene {s}: present={pr} absent med/p90/max="
              f"{ab[len(ab)//2]}/{ab[int(len(ab)*.9)]}/{ab[-1]} "
              f"top16 {in16}/3", flush=True)
