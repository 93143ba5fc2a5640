"""Temporal slab persistence (coarse->fine serving): unit semantics of the
age/tracked/merge helpers and the end-to-end streaming behavior — a
recently-detected weak object keeps its reserved fine-slab slot when the
coarse statistic would drop it (the 30 Hz-loop feature the reference's
frame-at-a-time pipeline has no analog for; selection-only: per-object
match results stay bitwise-exact, ops/pallas/segmented.py contract)."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from tod_tpu.db import InMemoryDb, insert_observation, load_models_for_objects
from tod_tpu.geometry.detection import (AGE_NEVER, ActivationConfig,
                                        GuessConfig, merge_tracked,
                                        tracked_from_age, update_age)
from tod_tpu.geometry.ransac import ObjectDetections, RansacConfig
from tod_tpu.models import FusedDetector, FusedDetectorConfig, TodTrainer
from tod_tpu.utils.synthetic import (DEFAULT_K, SyntheticBox, SyntheticObject,
                                     compose_scene, facing_pose,
                                     presenting_pose,
                                     turntable_observations)


def test_tracked_from_age_picks_recent_within_ttl():
    age = jnp.asarray([5, 0, 2, AGE_NEVER, 1], jnp.int32)
    got = np.asarray(tracked_from_age(age, width=3, ttl=2))
    assert set(got.tolist()) == {1, 4, 2}
    got2 = np.asarray(tracked_from_age(age, width=3, ttl=0))
    assert got2[0] == 1 and (got2[1:] == -1).all()
    # width above catalog size clamps
    got3 = np.asarray(tracked_from_age(age, width=8, ttl=1000))
    assert got3.shape == (5,)


def test_tracked_from_age_needy_priority():
    """Under capacity pressure, objects the coarse screen does NOT select
    (needy) outrank equally-recent coarse-ranked ones: three age-0 objects
    with width 2 previously evicted the just-discovered weak find by index
    tie-break (the measured latch failure in the CLI drive)."""
    age = jnp.asarray([0, 0, 0], jnp.int32)
    needy = jnp.asarray([False, False, True])
    got = np.asarray(tracked_from_age(age, width=2, ttl=2, needy=needy))
    assert 2 in got.tolist(), got
    # recency still orders WITHIN a neediness class
    age2 = jnp.asarray([2, 0, 1, 0], jnp.int32)
    needy2 = jnp.asarray([True, False, True, False])
    got2 = np.asarray(tracked_from_age(age2, width=3, ttl=2, needy=needy2))
    assert got2.tolist()[:2] == [2, 0]        # needy first, recent first
    # eligibility (ttl) still gates regardless of neediness
    age3 = jnp.asarray([5, 0], jnp.int32)
    needy3 = jnp.asarray([True, False])
    got3 = np.asarray(tracked_from_age(age3, width=2, ttl=2, needy=needy3))
    assert got3.tolist() == [1, -1]


def test_merge_tracked_dedups_and_holes():
    sel = jnp.asarray([7, 3], jnp.int32)
    tracked = jnp.asarray([3, 9, -1], jnp.int32)
    got = np.asarray(merge_tracked(sel, tracked))
    assert got.tolist() == [7, 3, -1, 9, -1]


def test_update_age_resets_on_acceptance_and_saturates():
    age = jnp.asarray([0, 4, AGE_NEVER], jnp.int32)
    det = ObjectDetections(
        R=jnp.zeros((3, 2, 3, 3)), T=jnp.zeros((3, 2, 3)),
        n_inliers=jnp.zeros((3, 2), jnp.int32),
        accepted=jnp.asarray([[False, True], [False, False],
                              [False, False]]),
        rms_residual=jnp.zeros((3, 2)),
        clique_size=jnp.zeros((3, 2), jnp.int32))
    got = np.asarray(update_age(age, det))
    assert got.tolist() == [0, 5, AGE_NEVER + 1]
    # saturation: repeated misses never overflow past AGE_NEVER + 1
    again = np.asarray(update_age(jnp.asarray(got), det))
    assert again.tolist() == [0, 6, AGE_NEVER + 1]


def test_update_age_latch_gate_filters_low_confidence_accepts():
    """track_min_confidence semantics: only accepted instances at or above
    the gate refresh the latch — an 8-16-inlier junk accept (the ungated
    reference contract's dominant output, bench precision 0.087) must not
    occupy a tracked slot. Gate 0 keeps every accepted pose latching."""
    age = jnp.asarray([3, 3, 3], jnp.int32)
    det = ObjectDetections(
        R=jnp.zeros((3, 2, 3, 3)), T=jnp.zeros((3, 2, 3)),
        n_inliers=jnp.asarray([[10, 0], [26, 9], [0, 0]], jnp.int32),
        accepted=jnp.asarray([[True, False], [True, True],
                              [False, False]]),
        rms_residual=jnp.zeros((3, 2)),
        clique_size=jnp.zeros((3, 2), jnp.int32))
    got = np.asarray(update_age(age, det, min_confidence=16.0))
    assert got.tolist() == [4, 0, 4]        # junk-only object 0 ages out
    ungated = np.asarray(update_age(age, det))
    assert ungated.tolist() == [0, 0, 4]    # gate 0 = previous behavior


def test_activation_cut_reserve_admits_unforced_discovery():
    """activation_cut: a cut saturated by forced (tracked) slots must still
    admit the top score-qualified unforced candidates (active_reserve) —
    the obj021 frontier failure. Weakest-scored forced slots yield first,
    and unforced boosts respect the min_score floor."""
    from tod_tpu.geometry.detection import activation_cut

    act = ActivationConfig(min_score=4, active_reserve=1)
    # 6 objects: 0-3 forced (tracked latches, scores 9,2,7,5),
    # 4 unforced score 8 (the fresh discovery), 5 unforced score 3 (junk
    # below min_score)
    scores = jnp.asarray([9, 2, 7, 5, 8, 3], jnp.float32)
    forced = jnp.asarray([True, True, True, True, False, False])
    active = np.asarray(activation_cut(scores, forced, 4, act)).tolist()
    assert 4 in active, active          # reserve admits the discovery
    assert 1 not in active, active      # weakest forced yields
    assert 5 not in active, active      # junk stays below min_score
    assert set(active) == {0, 2, 3, 4}

    # without a reserve, forced slots saturate the cut (the old behavior)
    act0 = ActivationConfig(min_score=4, active_reserve=0)
    active0 = np.asarray(activation_cut(scores, forced, 4, act0)).tolist()
    assert set(active0) == {0, 1, 2, 3}

    # forced slots bypass min_score (latch persistence rides tier-2)
    scores2 = jnp.asarray([0, 9], jnp.float32)
    forced2 = jnp.asarray([True, False])
    active2 = np.asarray(activation_cut(scores2, forced2, 2, act)).tolist()
    assert set(active2) == {0, 1}

    # no forced mask: plain top-k with the min_score floor (stateless path)
    active3 = np.asarray(activation_cut(scores, None, 4, act)).tolist()
    assert set(active3) == {0, 4, 2, 3}


def test_track_width_requires_coarse_and_slack():
    with pytest.raises(ValueError, match="coarse_stride"):
        FusedDetector([], FusedDetectorConfig(pipeline="segmented",
                                              track_width=2))
    with pytest.raises(ValueError, match="track_width"):
        FusedDetector([], FusedDetectorConfig(
            pipeline="segmented", coarse_stride=4, fine_width=2,
            track_width=2))


DB_JSON = json.dumps({"type": "mem", "collection": "tracking"})


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
    db = InMemoryDb.shared("tracking")
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


def _cfg(fine_width, track_width):
    return FusedDetectorConfig(
        n_features=2500, pipeline="segmented", q_cap=2048, radius=50.0,
        bucket_grid=(6, 8),   # the box's strong corners must not starve
                              # the weak plane out of q_cap in frame 2
        coarse_stride=4, fine_width=fine_width, track_width=track_width,
        track_ttl=2,
        activation=ActivationConfig(m_cap=128, n_hypotheses=128),
        guess=GuessConfig(ransac=RansacConfig(
            n_hypotheses=512, min_inliers=8, sensor_error=0.01),
            max_matches_per_object=384, max_active_objects=2))


def _frames(plane, box):
    """Frame 1: the weak-texture plane alone (coarse rank 0 — the only
    present object). Frame 2: a well-presented, strongly-textured box
    enters and takes coarse rank 0 (measured: margin mass follows texture
    distinctiveness), evicting the weak plane from a width-1 slab."""
    rng = np.random.default_rng(3)
    pose_p = facing_pose(rng, z=0.7, max_tilt=0.2, xy_extent=0.03)
    pose_p[1][0] = -0.14
    pose_b = presenting_pose(rng, z=0.9, max_tilt=0.2, xy_extent=0.03)
    pose_b[1][0] = 0.18
    frame1 = compose_scene([plane], [pose_p])
    frame2 = compose_scene([plane, box], [pose_p, pose_b])
    return frame1, frame2, pose_p


def test_tracking_keeps_evicted_object_in_slab(trained_pair):
    """Frame 1: the weak plane alone -> coarse top-1 selects it, it is
    detected, its age resets. Frame 2: the strong box takes the single
    coarse slot — WITHOUT tracking the plane drops out of the fine slab
    (control below); with a reserved slot it stays detected."""
    (plane, box), db = trained_pair
    models = load_models_for_objects(db, "all")
    frame1, frame2, pose_p = _frames(plane, box)

    det = FusedDetector(models, _cfg(fine_width=2, track_width=1))
    r1 = det.detect(frame1[0], frame1[1], DEFAULT_K)
    assert any(r.object_id == "weak_plane" for r in r1)
    r2 = det.detect(frame2[0], frame2[1], DEFAULT_K)
    found2 = {r.object_id for r in r2}
    assert found2 == {"strong_box", "weak_plane"}, found2
    # some accepted plane instance recovers the true pose (weak junk
    # secondaries at min_inliers=8 are expected reference behavior)
    dts = [np.linalg.norm(r.T - pose_p[1]) for r in r2
           if r.object_id == "weak_plane"]
    assert min(dts) < 0.02, dts


def test_tracked_pose_state_feeds_seeding(trained_pair):
    """The streaming loop's last-accepted-pose state (tracked-pose seeding,
    geometry/ransac.py SeedPose): after an accepted detection the per-object
    age resets and _last_R/_last_T hold a pose near the ground truth, so the
    next frame's tier-2 is seeded with it."""
    (plane, box), db = trained_pair
    models = load_models_for_objects(db, "all")
    frame1, _, pose_p = _frames(plane, box)

    det = FusedDetector(models, _cfg(fine_width=2, track_width=1))
    r1 = det.detect(frame1[0], frame1[1], DEFAULT_K)
    assert any(r.object_id == "weak_plane" for r in r1)
    idx = det.object_ids.index("weak_plane")
    assert int(det._age[idx]) == 0
    assert np.linalg.norm(np.asarray(det._last_T[idx]) - pose_p[1]) < 0.02
    # the seed helper marks exactly the live latches
    from tod_tpu.models.fused import _jit_seeds
    seeds = _jit_seeds(det._age, det._last_R, det._last_T,
                       det.config.track_ttl)
    assert bool(seeds.ok[idx])
    other = det.object_ids.index("strong_box")
    assert not bool(seeds.ok[other])


def test_coarse_query_subsampling_still_detects(trained_pair):
    """coarse_q_stride subsamples the RANKING queries only (the coarse
    sweep runs near the matcher roofline at large catalogs); the fine
    pass sees every query, so detection quality holds on the same frames
    the tracking tests use."""
    import dataclasses

    (plane, box), db = trained_pair
    models = load_models_for_objects(db, "all")
    frame1, frame2, pose_p = _frames(plane, box)

    cfg = dataclasses.replace(_cfg(fine_width=2, track_width=1),
                              coarse_q_stride=2)
    det = FusedDetector(models, cfg)
    r1 = det.detect(frame1[0], frame1[1], DEFAULT_K)
    assert any(r.object_id == "weak_plane" for r in r1)
    r2 = det.detect(frame2[0], frame2[1], DEFAULT_K)
    found2 = {r.object_id for r in r2}
    assert found2 == {"strong_box", "weak_plane"}, found2
    dts = [np.linalg.norm(r.T - pose_p[1]) for r in r2
           if r.object_id == "weak_plane"]
    assert min(dts) < 0.02, dts


def test_control_without_tracking_drops_evicted_object(trained_pair):
    """The same frames through a width-1 slab with no reserved slot: the
    box's dominant coarse statistic evicts the present plane (this is the
    failure mode tracking exists for; it also certifies the test above
    passes BECAUSE of the reserved slot, not because the slab was wide
    enough anyway)."""
    (plane, box), db = trained_pair
    models = load_models_for_objects(db, "all")
    frame1, frame2, _ = _frames(plane, box)

    det = FusedDetector(models, _cfg(fine_width=1, track_width=0))
    r1 = det.detect(frame1[0], frame1[1], DEFAULT_K)
    assert any(r.object_id == "weak_plane" for r in r1)
    r2 = det.detect(frame2[0], frame2[1], DEFAULT_K)
    found2 = {r.object_id for r in r2}
    assert "strong_box" in found2
    assert "weak_plane" not in found2, (
        "control slab unexpectedly retained the plane — the box no longer "
        "outranks it; rebalance the fixture poses")


def test_tracking_slab_wider_than_catalog_clamps_coarse_prefix(trained_pair):
    """fine_width - reserved (7) exceeds the 2-object catalog:
    coarse_select returns only 2 coarse slots, so the streaming loop must
    keep the CLAMPED coarse prefix as last frame's selection (slicing the
    un-clamped width would leak the reserved slot ids into
    _last_coarse_sel, marking latched objects not-needy). Detection
    itself must be unaffected."""
    (plane, box), db = trained_pair
    models = load_models_for_objects(db, "all")
    frame1, frame2, pose_p = _frames(plane, box)

    det = FusedDetector(models, _cfg(fine_width=8, track_width=1))
    r1 = det.detect(frame1[0], frame1[1], DEFAULT_K)
    assert any(r.object_id == "weak_plane" for r in r1)
    assert det._last_coarse_sel.shape == (2,), (
        "coarse prefix must clamp to the catalog size")
    r2 = det.detect(frame2[0], frame2[1], DEFAULT_K)
    found2 = {r.object_id for r in r2}
    assert found2 == {"strong_box", "weak_plane"}, found2
    dts = [np.linalg.norm(r.T - pose_p[1]) for r in r2
           if r.object_id == "weak_plane"]
    assert min(dts) < 0.02, dts
