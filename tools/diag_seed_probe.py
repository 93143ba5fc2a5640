"""CPU probe: why doesn't a near-perfect SeedPose dominate tier-2 on
obj006's bench placement?

Reconstructs the EXACT tier-2 store for DIAG_OBJ in its bench scene
(cached 400-object DB, serving operating point), then inspects the seed
hypothesis mechanics directly:
  * strict-sigma inlier count at the ground-truth pose (pre/post polish)
  * the greedy-clique certificate on that inlier set
  * ransac_round with seed=GT at tiny + full budgets
  * detect_object_instances accepted rows with/without the seed

Run: cd /root/repo && JAX_PLATFORMS=cpu python tools/diag_seed_probe.py
"""

import dataclasses
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402


def main():
    from tod_tpu.geometry.adjacency import fill_adjacency
    from tod_tpu.geometry.detection import build_object_stores
    from tod_tpu.geometry.ransac import (SeedPose, _greedy_clique_size,
                                         detect_object_instances,
                                         ransac_round)
    from tod_tpu.geometry.transforms import apply_rt, invert_pose, kabsch
    from tod_tpu.models.fused import _stage_features_compact
    from tod_tpu.ops.pallas.segmented import object_top1_xla, pack_segmented
    from tod_tpu.ops.image import rgb_to_gray
    from tod_tpu.utils.synthetic import DEFAULT_K

    target = os.environ.get("DIAG_OBJ", "obj006")
    n_objects = int(os.environ.get("DIAG_OBJECTS", "400"))
    os.environ.setdefault("BENCH_OBJECTS", str(n_objects))
    objects, models = bench.build_db(n_objects)
    scenes = bench.build_scenes(objects, 8)
    scene = next(s for s in scenes if any(g[0] == target for g in s[2]))
    image, depth, gt = scene
    gt_r, gt_t = next((R, T) for oid, R, T in gt if oid == target)
    cfg = bench.build_config(5000)

    # features + compaction (the exact serving stage, CPU)
    img = jnp.asarray(np.asarray(image), jnp.float32)
    gray = rgb_to_gray(img)
    xy, qp, dsc, ok = jax.jit(
        lambda g, d, K: _stage_features_compact(g, d, K, cfg=cfg))(
        gray, jnp.asarray(depth), jnp.asarray(DEFAULT_K, jnp.float32))

    # segmented match against ONLY the target model (its own column is
    # what build_object_stores consumes)
    o_idx = next(i for i, m in enumerate(models)
                 if m.object_id == target)
    db1 = pack_segmented([models[o_idx]])
    dist, rows = object_top1_xla(dsc, db1)
    bench.log(f"{target}: {int(((dist[:, 0] <= cfg.radius) & ok).sum())} "
              f"in-radius matches of {int(ok.sum())} valid queries")

    # NOTE: serving computes the margin level over ALL objects; a single-
    # object probe has no cross-object level, so use level=dist itself
    # minus margin (priority differences only reorder the cap — with
    # m_cap >= in-radius count the store contents are identical)
    level = jnp.zeros(dist.shape[0])
    m = build_object_stores(dist, rows, ok, qp, xy, db1.points,
                            db1.obj_start, jnp.asarray([0]),
                            cfg.guess.max_matches_per_object, cfg.radius,
                            level)
    m = jax.tree.map(lambda x: x[0], m)
    graphs = fill_adjacency(m, db1.spans[0], cfg.guess.sensor_error)
    n_valid = int(graphs.valid.sum())
    bench.log(f"store: {int(m.valid.sum())} matches, {n_valid} after "
              f"degree prune")

    # ground-truth pose as a seed (output convention: R @ obj + T = cam)
    sigma = cfg.guess.sensor_error
    q, t = m.query_pts, m.train_pts
    r_i, t_i = invert_pose(jnp.asarray(gt_r, jnp.float32),
                           jnp.asarray(gt_t, jnp.float32))
    res = np.asarray(((apply_rt(r_i, t_i, q) - t) ** 2).sum(-1))
    in_gt = np.asarray(graphs.valid) & (res < sigma * sigma)
    bench.log(f"strict-sigma inliers at GT pose: {int(in_gt.sum())}")

    # one polish refit (what the seed hypothesis scores with)
    fit_p = kabsch(q, t, jnp.asarray(in_gt, jnp.float32))
    res_p = np.asarray(((apply_rt(fit_p.R, fit_p.T, q) - t) ** 2).sum(-1))
    in_p = np.asarray(graphs.valid) & (res_p < sigma * sigma)
    r_out, t_out = invert_pose(fit_p.R, fit_p.T)
    bench.log(f"after polish refit: {int(in_p.sum())} inliers, pose err "
              f"{np.linalg.norm(np.asarray(t_out) - gt_t) * 100:.2f} cm")

    # greedy clique certificate on the polished inlier set
    minimal = cfg.guess.ransac.clique_minimal_size
    samp_deg = np.asarray((graphs.sample & graphs.valid[None, :]).sum(-1))
    cand = jnp.asarray((in_p & (samp_deg >= minimal))[None, :])
    csize = int(_greedy_clique_size(graphs.sample, cand, minimal + 1)[0])
    bench.log(f"greedy clique size on seed inliers (need > {minimal}): "
              f"{csize}  [candidates {int(cand.sum())}]")

    # exact max clique on the same candidate subgraph (is the greedy lower
    # bound underfinding, or is the true support genuinely sparse?)
    from tod_tpu.native import Graph
    idx = np.flatnonzero(np.asarray(cand[0]))
    g = Graph(len(idx))
    adj = np.asarray(graphs.sample)
    for a in range(len(idx)):
        for b_ in range(a + 1, len(idx)):
            if adj[idx[a], idx[b_]]:
                g.add_edge(a, b_)
    exact = g.find_maximum_clique()
    bench.log(f"EXACT max clique on seed inliers: {len(exact)}")

    seed = SeedPose(R=jnp.asarray(gt_r, jnp.float32),
                    T=jnp.asarray(gt_t, jnp.float32), ok=jnp.asarray(True))
    for hyp in (1, cfg.guess.ransac.n_hypotheses):
        rcfg = dataclasses.replace(cfg.guess.ransac, n_hypotheses=hyp)
        for s, tag in ((None, "bare"), (seed, "seeded")):
            rr = ransac_round(jax.random.PRNGKey(0), m, graphs,
                              graphs.valid, rcfg, s)
            err = np.linalg.norm(np.asarray(rr.T) - gt_t) * 100
            bench.log(f"ransac_round hyp={hyp:4d} {tag:6s}: found="
                      f"{bool(rr.found)} n_unique={int(rr.n_unique)} "
                      f"errT={err:.2f} cm")

    det = detect_object_instances(jax.random.PRNGKey(0), m, graphs,
                                  cfg.guess.ransac, seed)
    for i in range(det.accepted.shape[0]):
        if bool(det.accepted[i]):
            err = np.linalg.norm(np.asarray(det.T[i]) - gt_t) * 100
            bench.log(f"instance {i}: n={int(det.n_inliers[i])} "
                      f"errT={err:.2f} cm")


if __name__ == "__main__":
    main()
