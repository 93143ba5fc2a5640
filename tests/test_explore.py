"""Exploration slots (coarse->fine serving): bounded-latency discovery of
objects the coarse screen excludes. ``explore_width`` fine-slab slots cycle
deterministically through the catalog, so any PRESENT object reaches the
exact fine pass within ceil(objects / explore_width) frames even when the
coarse margin statistic never ranks its texture (the catalog-relative
activation floor, PROGRESS.md); ``track_width`` then latches the find.
Selection-only, like tracking: per-object match results stay bitwise-exact
(ops/pallas/segmented.py gathered-kernel contract)."""

import json

import numpy as np
import pytest

from tod_tpu.db import InMemoryDb, insert_observation, load_models_for_objects
from tod_tpu.db.models import TodModel
from tod_tpu.geometry.detection import ActivationConfig, GuessConfig
from tod_tpu.geometry.ransac import RansacConfig
from tod_tpu.models import FusedDetector, FusedDetectorConfig, TodTrainer
from tod_tpu.utils.synthetic import (DEFAULT_K, SyntheticBox, SyntheticObject,
                                     compose_scene, facing_pose,
                                     presenting_pose,
                                     turntable_observations)


def test_explore_requires_coarse_and_room():
    with pytest.raises(ValueError, match="coarse_stride"):
        FusedDetector([], FusedDetectorConfig(pipeline="segmented",
                                              explore_width=2))
    with pytest.raises(ValueError, match="explore_width"):
        FusedDetector([], FusedDetectorConfig(
            pipeline="segmented", coarse_stride=4, fine_width=3,
            track_width=2, explore_width=1))


def test_explore_ids_rotate_uniquely():
    det = FusedDetector([], FusedDetectorConfig(
        pipeline="segmented", coarse_stride=4, fine_width=8,
        explore_width=3))
    det.object_ids = [f"o{i}" for i in range(7)]  # rotation is id-count only
    seen = []
    for _ in range(7):
        ids = np.asarray(det._explore_ids())
        assert ids.shape == (3,)
        assert len(set(ids.tolist())) == 3, "dups within one frame's slots"
        seen.extend(ids.tolist())
    # 7 frames x 3 slots = 3 full cycles of 7: every object visited equally
    assert sorted(set(seen)) == list(range(7))
    assert all(seen.count(i) == 3 for i in range(7))


def test_explore_ids_pad_when_catalog_smaller():
    det = FusedDetector([], FusedDetectorConfig(
        pipeline="segmented", coarse_stride=4, fine_width=8,
        explore_width=5))
    det.object_ids = ["a", "b", "c"]
    ids = np.asarray(det._explore_ids())
    assert ids.tolist() == [0, 1, 2, -1, -1]


def test_explore_ids_skip_capacity_padding_slots():
    """catalog_capacity padding slots (empty object ids) never match, so
    the rotation must cycle REAL slots only — otherwise the documented
    ceil(O/E) discovery bound silently becomes ceil(capacity/E) and forced
    tier-1 entries are spent on zero-row objects."""
    det = FusedDetector([], FusedDetectorConfig(
        pipeline="segmented", coarse_stride=4, fine_width=8,
        explore_width=2))
    det.object_ids = ["a", "", "b", "", "", "c"]  # capacity-padded catalog
    seen = []
    for _ in range(3):
        seen.extend(np.asarray(det._explore_ids()).tolist())
    assert sorted(set(seen)) == [0, 2, 5], "padding slots must be skipped"
    assert all(seen.count(i) == 2 for i in (0, 2, 5))


DB_JSON = json.dumps({"type": "mem", "collection": "explore"})


def _train(db, obj):
    for obs in turntable_observations(obj, n_views=8):
        insert_observation(db, obj.object_id, obs["frame_number"],
                           obs["image"], obs["depth"], obs["mask"],
                           obs["K"], obs["R"], obs["T"])
    TodTrainer("trainer", object_id=obj.object_id, json_db=DB_JSON,
               json_feature_params=json.dumps(
                   {"type": "ORB", "n_features": 800, "n_levels": 3,
                    "scale_factor": 1.2})).process()


@pytest.fixture(scope="module")
def trained_pair():
    InMemoryDb.reset_shared()
    db = InMemoryDb.shared("explore")
    weak = SyntheticObject.make("weak_plane", seed=21)
    strong = SyntheticBox.make("strong_box", seed=7)
    _train(db, weak)
    _train(db, strong)
    yield (weak, strong), db
    InMemoryDb.reset_shared()


@pytest.fixture(autouse=True)
def _reset_shared_dbs():
    # module-scoped setup conflicts with the autouse db-reset fixture
    yield


def _cfg(fine_width, explore_width, track_width=0):
    return FusedDetectorConfig(
        n_features=2500, pipeline="segmented", q_cap=2048, radius=50.0,
        bucket_grid=(6, 8),
        coarse_stride=4, fine_width=fine_width, track_width=track_width,
        track_ttl=2, explore_width=explore_width,
        activation=ActivationConfig(m_cap=128, n_hypotheses=128),
        guess=GuessConfig(ransac=RansacConfig(
            n_hypotheses=512, min_inliers=8, sensor_error=0.01),
            max_matches_per_object=384, max_active_objects=2))


def _scene(plane, box):
    """One static scene with BOTH objects present; the strongly-textured
    box dominates the coarse margin statistic (test_tracking.py measured
    this ordering), so a width-1 coarse screen permanently excludes the
    weak plane — the failure mode exploration exists for."""
    rng = np.random.default_rng(3)
    pose_p = facing_pose(rng, z=0.7, max_tilt=0.2, xy_extent=0.03)
    pose_p[1][0] = -0.14
    pose_b = presenting_pose(rng, z=0.9, max_tilt=0.2, xy_extent=0.03)
    pose_b[1][0] = 0.18
    return compose_scene([plane, box], [pose_p, pose_b]), pose_p


def test_control_narrow_screen_never_finds_weak_object(trained_pair):
    """Without exploration, repeating the same frame through a width-1
    coarse slab never discovers the excluded plane (certifies the test
    below passes BECAUSE of the exploration slot)."""
    (plane, box), db = trained_pair
    models = load_models_for_objects(db, "all")
    frame, _ = _scene(plane, box)
    det = FusedDetector(models, _cfg(fine_width=1, explore_width=0))
    for _ in range(3):
        found = {r.object_id for r in det.detect(frame[0], frame[1],
                                                 DEFAULT_K)}
        assert "strong_box" in found
        assert "weak_plane" not in found, (
            "control slab unexpectedly admitted the plane — the box no "
            "longer dominates the coarse statistic; rebalance the fixture")


def test_explore_discovers_within_cycle_and_tracking_latches(trained_pair):
    """fine_width=4 = 1 coarse slot (the box takes it every frame) +
    2 tracked + 1 exploration slot over a 2-object catalog: the rotation
    must bring the excluded plane into the fine pass within 2 frames, and
    slab persistence must keep it found on EVERY subsequent frame even
    when the exploration slot has rotated away."""
    (plane, box), db = trained_pair
    models = load_models_for_objects(db, "all")
    frame, pose_p = _scene(plane, box)
    det = FusedDetector(models,
                        _cfg(fine_width=4, explore_width=1, track_width=2))

    cycle = -(-len(models) // 1)   # ceil(O / E) = 2 frames
    discovered_at = None
    for t in range(cycle):
        found = {r.object_id for r in det.detect(frame[0], frame[1],
                                                 DEFAULT_K)}
        if "weak_plane" in found:
            discovered_at = t
            break
    assert discovered_at is not None, (
        f"exploration failed to discover the plane within the "
        f"{cycle}-frame rotation cycle")

    # latched: found on every later frame (tracked slot, ttl 2 > 0 misses)
    for _ in range(3):
        results = det.detect(frame[0], frame[1], DEFAULT_K)
        found = {r.object_id for r in results}
        assert found == {"strong_box", "weak_plane"}, found
        dts = [np.linalg.norm(r.T - pose_p[1]) for r in results
               if r.object_id == "weak_plane"]
        assert min(dts) < 0.02, dts


# ---------------------------------------------------------------------------
# Reserved slots must bypass the IN-SLAB tier-1 prescreen: the margin-mass
# statistic that coarse-excluded a weak texture would otherwise screen it out
# again inside the slab, silently voiding exploration's bounded-latency
# contract and tracking's latch (reserved_force_mask / detect_frame_segmented
# ``force``).
# ---------------------------------------------------------------------------


def test_force_bypasses_tier1_prescreen():
    """Unit-level: with prescreen=2 over 3 objects where object 0 ranks
    LAST on margin-mass, tier-1 never scores it — unless its slot is
    forced, in which case it scores and one box is displaced instead."""
    import jax
    import jax.numpy as jnp

    from tod_tpu.geometry.detection import (detect_frame_segmented,
                                            prescreen_scores)
    from tod_tpu.ops.pallas.segmented import object_top1_xla, pack_segmented

    rng = np.random.default_rng(4)
    models = []
    for i, n in enumerate((96, 160, 160)):
        desc = rng.integers(0, 256, (n, 32), np.uint8)
        pts = rng.uniform(-0.08, 0.08, (n, 3)).astype(np.float32)
        models.append(TodModel(f"o{i}", desc, pts))
    q_n = 256
    qp = np.full((q_n, 3), np.nan, np.float32)
    xy = np.zeros((q_n, 2), np.float32)
    dsc = rng.integers(0, 256, (q_n, 32), np.uint8)
    ok = np.zeros(q_n, bool)
    cursor = 0
    for i, take in ((0, 24), (1, 80), (2, 80)):   # o0 weakly present
        m = models[i]
        sel_rows = rng.choice(m.n_points, take, replace=False)
        Rg = np.linalg.qr(rng.normal(size=(3, 3)))[0]
        if np.linalg.det(Rg) < 0:
            Rg[:, 0] *= -1
        Tg = np.array([0.15 * i - 0.2, 0.0, 0.8], np.float32)
        qp[cursor:cursor + take] = m.points[sel_rows] @ Rg.T + Tg
        xy[cursor:cursor + take] = rng.uniform(30, 600, (take, 2))
        dsc[cursor:cursor + take] = m.descriptors[sel_rows]
        ok[cursor:cursor + take] = True
        cursor += take
    db = pack_segmented(models, db_chunk=2048)
    dist, rows = object_top1_xla(jnp.asarray(dsc), db, db_chunk=2048)

    # fixture certification: o0 really is prescreen-ranked last
    pre = prescreen_scores(dist, jnp.median(dist, axis=1),
                           jnp.asarray(ok), 60.0, 64)
    assert float(pre[0]) < min(float(pre[1]), float(pre[2])), (
        "fixture no longer exercises the screen: o0 outranks a box")

    act = ActivationConfig(m_cap=64, n_hypotheses=64, prescreen=2,
                           object_batch=2)
    cfg = GuessConfig(ransac=RansacConfig(n_hypotheses=128, min_inliers=8),
                      max_matches_per_object=64, max_active_objects=3,
                      object_batch=2)
    args = (jnp.asarray(dist), jnp.asarray(rows), jnp.asarray(ok),
            jnp.asarray(qp), jnp.asarray(xy), db.points, db.obj_start,
            db.spans, cfg, act, 60.0)
    key = jax.random.PRNGKey(1)
    scores_no, _ = detect_frame_segmented(key, *args)
    assert float(scores_no[0]) == 0.0, (
        "P=2 should have screened weakly-present o0 out of tier-1")
    assert float(scores_no[1]) > 0 and float(scores_no[2]) > 0

    force = jnp.asarray([True, False, False])
    scores_f, _ = detect_frame_segmented(key, *args, force)
    assert float(scores_f[0]) > 0, (
        "forced slot did not reach tier-1 despite prescreen bypass")
    # without expansion (n_forced=0) the forced slot DISPLACES one of the
    # P=2 tier-1 slots
    assert sum(float(s) == 0.0 for s in scores_f) >= 1

    # with expansion (n_forced=1, what the serving stages pass) the tier-1
    # set grows to P + reserved = 3: every object is scored — forcing
    # never steals coarse candidates' budget
    scores_e, _ = detect_frame_segmented(key, *args, force, 1)
    assert all(float(s) > 0 for s in scores_e), np.asarray(scores_e)

    # force_active (tracked slots): bypasses the ACTIVATION CUT too — the
    # object reaches tier-2 even with tier-1 score 0 (it stays screened out
    # of tier-1), and tier-2's inlier evidence accepts it
    scores_a, det_a = detect_frame_segmented(key, *args, None, 0, force)
    assert float(scores_a[0]) == 0.0          # still prescreen-screened
    assert bool(np.asarray(det_a.accepted)[0].any()), (
        "tracked-slot activation forcing did not reach tier-2")


@pytest.fixture(scope="module")
def trained_trio():
    db = InMemoryDb.shared("explore3")
    weak = SyntheticObject.make("weak_plane", seed=21)
    box_a = SyntheticBox.make("box_a", seed=7)
    box_b = SyntheticBox.make("box_b", seed=8)
    for obj in (weak, box_a, box_b):
        for obs in turntable_observations(obj, n_views=8):
            insert_observation(db, obj.object_id, obs["frame_number"],
                               obs["image"], obs["depth"], obs["mask"],
                               obs["K"], obs["R"], obs["T"])
        TodTrainer("trainer", object_id=obj.object_id,
                   json_db=json.dumps({"type": "mem",
                                       "collection": "explore3"}),
                   json_feature_params=json.dumps(
                       {"type": "ORB", "n_features": 800, "n_levels": 3,
                        "scale_factor": 1.2})).process()
    yield (weak, box_a, box_b), db


def test_explore_discovers_despite_slab_prescreen(trained_trio):
    """E2E streaming: 3-object catalog, both boxes dominate the margin-mass
    statistic, slab = 3 coarse slots + 1 exploration slot, and the tier-1
    set is prescreen(2) + reserved(1) = 3 < the 4 slab slots — before the
    prescreen bypass, the plane reached the fine slab but tier-1 never
    scored it (the two boxes took both prescreen slots), so it was NEVER
    discovered; with the bypass, the frame whose exploration slot rotates
    onto the plane forces it into tier-1."""
    (plane, box_a, box_b), db = trained_trio
    models = load_models_for_objects(db, "all")
    rng = np.random.default_rng(5)
    pose_p = facing_pose(rng, z=0.7, max_tilt=0.2, xy_extent=0.02)
    pose_p[1][0] = -0.16
    pose_a = presenting_pose(rng, z=0.9, max_tilt=0.2, xy_extent=0.02)
    pose_a[1][0] = 0.16
    pose_b = presenting_pose(rng, z=0.95, max_tilt=0.2, xy_extent=0.02)
    pose_b[1][1] = 0.12
    frame = compose_scene([plane, box_a, box_b], [pose_p, pose_a, pose_b])

    cfg = FusedDetectorConfig(
        n_features=2500, pipeline="segmented", q_cap=2048, radius=50.0,
        bucket_grid=(6, 8),
        coarse_stride=4, fine_width=4, explore_width=1,
        activation=ActivationConfig(m_cap=128, n_hypotheses=128,
                                    prescreen=2),
        guess=GuessConfig(ransac=RansacConfig(
            n_hypotheses=512, min_inliers=8, sensor_error=0.01),
            # room for all three: with the EXPANDED tier-1 (P=2 + 1
            # reserved) both boxes keep their scores, so the plane must
            # clear the activation cut on merit, not by displacing a box
            max_matches_per_object=384, max_active_objects=3))
    det = FusedDetector(models, cfg)

    cycle = -(-len(models) // 1) + 1   # one full rotation + slack
    discovered_at = None
    for t in range(cycle):
        found = {r.object_id for r in det.detect(frame[0], frame[1],
                                                 DEFAULT_K)}
        if "weak_plane" in found:
            discovered_at = t
            break
    assert discovered_at is not None, (
        "exploration slot never reached tier-1: the in-slab prescreen "
        "(P=2, both boxes ranked above the plane) screened the explored "
        "object out — reserved slots must bypass the prescreen")
