"""CLI smoke tests (the reference's help-test analog, test/CMakeLists.txt:6-9)
plus a real train+detect round trip through the CLIs."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
ENV = {**os.environ, "JAX_PLATFORMS": "cpu",
       "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")}


def _run(args, **kw):
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, env=ENV, cwd=REPO, **kw)


def test_tod_help():
    r = _run([os.path.join(REPO, "apps", "tod"), "--help"])
    assert r.returncode == 0
    assert "training" in r.stdout and "detection" in r.stdout


def test_feature_viewer_help():
    r = _run([os.path.join(REPO, "apps", "feature_viewer"), "--help"])
    assert r.returncode == 0
    assert "object_id" in r.stdout


@pytest.mark.slow
def test_cli_train_then_view_then_detect(tmp_path):
    from tod_tpu.db import FilesystemDb, insert_observation
    from tod_tpu.utils.synthetic import (DEFAULT_K, SyntheticObject,
                                         compose_scene, facing_pose,
                                         turntable_observations)

    db_root = str(tmp_path / "db")
    db = FilesystemDb(db_root)
    obj = SyntheticObject.make("cli_obj", seed=42)
    for obs in turntable_observations(obj, n_views=6,
                                      elevations_deg=(65.0,)):
        insert_observation(db, "cli_obj", obs["frame_number"], obs["image"],
                           obs["depth"], obs["mask"], obs["K"], obs["R"],
                           obs["T"])

    # training config pointed at the temp DB
    conf = tmp_path / "training.ork"
    conf.write_text(f"""
pipeline1:
  type: TodTrainer
  module: object_recognition_tod
  parameters:
    feature: {{type: ORB, n_features: 400, n_levels: 3, scale_factor: 1.2}}
    descriptor: {{type: ORB}}
    db: {{type: filesystem, root: '{db_root}'}}
    object_ids: "all"
""")
    r = _run([os.path.join(REPO, "apps", "tod"), "training", "-c", str(conf)])
    assert r.returncode == 0, r.stderr
    assert "training object cli_obj" in r.stdout

    r = _run([os.path.join(REPO, "apps", "feature_viewer"), "cli_obj",
              "--db", json.dumps({"type": "filesystem", "root": db_root})])
    assert r.returncode == 0, r.stderr
    assert "points:" in r.stdout

    # detection: render a scene, save frames, run the detection CLI
    rng = np.random.default_rng(3)
    pose = facing_pose(rng, z=0.75, max_tilt=0.3)
    image, depth = compose_scene([obj], [pose])
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    np.savez(frames_dir / "frame0.npz", image=image, depth=depth, K=DEFAULT_K)

    dconf = tmp_path / "detection.ork"
    dconf.write_text(f"""
source1:
  type: OpenNI
  module: object_recognition_core.io.source
pipeline1:
  type: TodDetector
  module: object_recognition_tod
  inputs: [source1]
  parameters:
    object_ids: "all"
    feature: {{type: ORB, n_features: 1200, n_levels: 3, scale_factor: 1.2}}
    descriptor: {{type: ORB}}
    search: {{type: LSH, radius: 35, ratio: 0.8}}
    n_ransac_iterations: 512
    min_inliers: 8
    sensor_error: 0.01
    db: {{type: filesystem, root: '{db_root}'}}
""")
    r = _run([os.path.join(REPO, "apps", "tod"), "detection", "-c",
              str(dconf), "--frames", str(frames_dir), "--timing"])
    assert r.returncode == 0, r.stderr
    assert "cli_obj" in r.stdout, r.stdout


def test_cli_honors_jax_platforms_env():
    """A CLI subprocess launched with JAX_PLATFORMS=cpu must actually land
    on the CPU backend. The TPU-pool sitecustomize force-selects its PJRT
    platform via jax.config at interpreter start (overriding the env var),
    which put CLI subprocesses on the single-client TPU tunnel — colliding
    with any concurrent bench and hanging whenever the tunnel was wedged.
    honor_jax_platforms_env() (called by both apps) re-asserts the env."""
    r = _run(["-c",
              "from tod_tpu.utils.platform import honor_jax_platforms_env;"
              "honor_jax_platforms_env();"
              "import jax; print('backend=' + jax.default_backend())"])
    assert r.returncode == 0, r.stderr
    assert "backend=cpu" in r.stdout, r.stdout
