"""Does cross-object margin priority beat distance priority for the
per-object store cap? Uses the (O, Q) top-1 dump from diag_activation.py."""
import sys

sys.path.insert(0, ".")
import numpy as np

data = np.load("/tmp/diag_act_data.npz")
pts_all = data["pts"]
N = pts_all.shape[0]

for s in range(4):
    d = data[f"d{s}"].astype(np.float32)   # (O, Q)
    i = data[f"i{s}"]
    qp = data[f"q{s}"]; v = data[f"v{s}"]
    q_fin = np.isfinite(qp).all(-1) & v
    present = data[f"gtidx{s}"].tolist()
    gtR = data[f"gtR{s}"]; gtT = data[f"gtT{s}"]
    med = np.median(d, axis=0)             # (Q,) per-query cross-object level
    for j, o in enumerate(present):
        keep = (d[o] <= 50) & q_fin
        tp = pts_all[o][np.maximum(i[o], 0)]
        err = np.linalg.norm(tp @ gtR[j].T + gtT[j] - qp, axis=1)
        correct = keep & (err < 0.02)
        sel = np.nonzero(keep)[0]
        for cap in (256, 512):
            by_d = sel[np.argsort(d[o][sel])[:cap]]
            margin = d[o] - med                    # lower = more distinctive
            by_m = sel[np.argsort(margin[sel])[:cap]]
            n_d = int(correct[by_d].sum())
            n_m = int(correct[by_m].sum())
            if cap == 256:
                line = (f"scene{s} obj{o:03d}: correct total "
                        f"{int(correct.sum())} | cap256 dist={n_d} "
                        f"margin={n_m}")
            else:
                line += f" | cap512 dist={n_d} margin={n_m}"
        print(line, flush=True)
