"""Real-capture ingest round trip (tools/ingest_frames.py): a TUM-format
RGB-D recording converts to the DatasetSource ``.npz`` frame spec with the
image bit-exact, depth within integer-millimeter rounding, the requested
intrinsics, and correct timestamp association — the camera -> tod_tpu
bridge (the reference's OpenNI/RosKinect sources,
/root/reference/conf/detection.ork:5-8, have no TPU-host analog)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import ingest_frames  # noqa: E402

from tod_tpu.cells.io import DatasetSource  # noqa: E402
from tod_tpu.utils.synthetic import (DEFAULT_K, SyntheticObject,  # noqa: E402
                                     compose_scene, facing_pose)

cv2 = pytest.importorskip("cv2")


def _render_frames(n):
    obj = SyntheticObject.make("ingest_obj", seed=11)
    rng = np.random.default_rng(4)
    out = []
    for _ in range(n):
        image, depth = compose_scene([obj], [facing_pose(rng, z=0.8)])
        out.append((np.asarray(image, np.uint8),
                    np.asarray(depth, np.uint16)))
    return out


def _write_tum(tmp_path, frames, dt_offset=0.004):
    """TUM layout: rgb/ + depth/ PNGs, rgb.txt/depth.txt timestamp lists
    (depth at 5000 units/m, timestamps offset by dt_offset like a real
    unsynchronized recording), plus one unmatched depth frame."""
    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    rgb_lines = ["# color images", "# timestamp filename"]
    dep_lines = ["# depth images"]
    for i, (image, depth_mm) in enumerate(frames):
        t = 1000.0 + i
        rp, dp = f"rgb/{t:.6f}.png", f"depth/{t + dt_offset:.6f}.png"
        cv2.imwrite(str(tmp_path / rp),
                    cv2.cvtColor(image, cv2.COLOR_RGB2BGR))
        cv2.imwrite(str(tmp_path / dp),
                    (depth_mm.astype(np.float64) * 5.0).astype(np.uint16))
        rgb_lines.append(f"{t:.6f} {rp}")
        dep_lines.append(f"{t + dt_offset:.6f} {dp}")
    # an unmatched depth frame far from any color timestamp must be dropped
    stray = frames[0][1]
    cv2.imwrite(str(tmp_path / "depth/2000.000000.png"),
                (stray.astype(np.float64) * 5.0).astype(np.uint16))
    dep_lines.append("2000.000000 depth/2000.000000.png")
    (tmp_path / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (tmp_path / "depth.txt").write_text("\n".join(dep_lines) + "\n")


def test_tum_ingest_round_trip(tmp_path):
    frames = _render_frames(3)
    _write_tum(tmp_path, frames)
    out = tmp_path / "out"
    n = ingest_frames.main([str(tmp_path), str(out), "--format", "tum",
                            "--fx", str(DEFAULT_K[0, 0]),
                            "--fy", str(DEFAULT_K[1, 1]),
                            "--cx", str(DEFAULT_K[0, 2]),
                            "--cy", str(DEFAULT_K[1, 2])])
    assert n == 3                      # the stray depth frame was dropped

    src = DatasetSource("source", path=str(out), loop=False)
    src.configure()
    for image, depth_mm in frames:
        src.process()
        got_img = src.outputs["image"]
        got_dep = src.outputs["depth"]
        got_k = src.outputs["K"]
        assert got_img.dtype == np.uint8 and got_img.shape == image.shape
        np.testing.assert_array_equal(got_img, image)      # PNG is lossless
        assert got_dep.dtype == np.uint16
        # 5000 units/m -> mm is exact for integer mm (x5 then /5)
        np.testing.assert_array_equal(got_dep, depth_mm)
        np.testing.assert_allclose(got_k, DEFAULT_K, rtol=1e-6)
    assert src.outputs["at_end"]


def test_pairs_ingest_and_depth_scale(tmp_path):
    frames = _render_frames(2)
    for i, (image, depth_mm) in enumerate(frames):
        cv2.imwrite(str(tmp_path / f"color_{i:04d}.png"),
                    cv2.cvtColor(image, cv2.COLOR_RGB2BGR))
        # a recorder writing 100 um units (10000 per meter)
        cv2.imwrite(str(tmp_path / f"depth_{i:04d}.png"),
                    (depth_mm.astype(np.float64) * 10.0).astype(np.uint16))
    out = tmp_path / "out"
    n = ingest_frames.main([str(tmp_path), str(out), "--format", "pairs",
                            "--depth-scale", "10000"])
    assert n == 2
    data = np.load(sorted(out.glob("*.npz"))[0])
    np.testing.assert_array_equal(data["image"], frames[0][0])
    np.testing.assert_array_equal(data["depth"], frames[0][1])


def test_pairs_mismatch_is_an_error(tmp_path):
    (tmp_path / "color_0000.png").write_bytes(b"")
    with pytest.raises(SystemExit, match="pair mismatch"):
        ingest_frames.main([str(tmp_path), str(tmp_path / "o"),
                            "--format", "pairs"])
