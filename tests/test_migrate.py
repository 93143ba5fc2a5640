"""Legacy-data interop: reference-era cv::Mat attachments + migration.

Round-trips a hand-built reference-format database — model documents with
zlib-deflated FileStorage-YAML cv::Mat attachments (the format
object_recognition_core's ``set_attachment<cv::Mat>`` writes for
src/training/ModelFiller.cpp:23-24), observation documents with PNG
image/depth/mask and YAML calibration — through ``tools/migrate_db.py``
into a tod_tpu filesystem backend, then trains and loads from the migrated
store (VERDICT r3 item 3)."""

import json
import os
import struct
import sys
import zlib

import cv2
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from tod_tpu.db import (FilesystemDb, load_models_for_objects)  # noqa: E402
from tod_tpu.db.document import Document  # noqa: E402
from tod_tpu.db.legacy import (LegacyDecodeError, decode_legacy_mat,  # noqa: E402
                               encode_legacy_mat)
from tod_tpu.models import TodTrainer  # noqa: E402
from tod_tpu.utils.synthetic import (SyntheticObject,  # noqa: E402
                                     turntable_observations)

import migrate_db  # noqa: E402


# ---------------------------------------------------------------------------
# decoder unit coverage
# ---------------------------------------------------------------------------


def test_decode_filestorage_yaml_zlib():
    desc = np.random.default_rng(0).integers(0, 256, (40, 32), np.uint8)
    blob = encode_legacy_mat(desc)
    assert blob[:2] != b"%Y"          # actually deflated
    out = decode_legacy_mat(blob)
    np.testing.assert_array_equal(out, desc)


def test_decode_filestorage_yaml_plain_and_float3():
    # the reference's points layout: 1 x N CV_32FC3
    pts = np.random.default_rng(1).random((1, 17, 3)).astype(np.float32)
    blob = encode_legacy_mat(pts, compress=False)
    assert blob.lstrip()[:5] == b"%YAML"
    out = decode_legacy_mat(blob)
    assert out.shape == (1, 17, 3)
    np.testing.assert_allclose(out, pts, rtol=1e-6)


def test_decode_png_rgb_and_u16_depth():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (24, 32, 3), np.uint8)
    png = cv2.imencode(".png", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))[1]
    np.testing.assert_array_equal(decode_legacy_mat(png.tobytes()), img)
    depth = rng.integers(0, 5000, (24, 32), np.uint16)
    png_d = cv2.imencode(".png", depth)[1]
    out = decode_legacy_mat(png_d.tobytes())
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, depth)


def test_decode_raw_header():
    pts = np.random.default_rng(3).random((9, 3)).astype(np.float32)
    # CV_32FC1 = depth 5, channels 1 -> type 5
    blob = struct.pack("<iii", 9, 3, 5) + pts.tobytes()
    np.testing.assert_array_equal(decode_legacy_mat(blob), pts)


def test_decode_npy_idempotent_and_garbage():
    arr = np.arange(12, dtype=np.int32).reshape(3, 4)
    np.testing.assert_array_equal(
        decode_legacy_mat(Document.encode_array(arr)), arr)
    with pytest.raises(LegacyDecodeError):
        decode_legacy_mat(b"definitely not a matrix")


def test_document_decode_array_falls_back_to_legacy():
    desc = np.random.default_rng(4).integers(0, 256, (8, 32), np.uint8)
    out = Document.decode_array(encode_legacy_mat(desc))
    np.testing.assert_array_equal(out, desc)


# ---------------------------------------------------------------------------
# full migration round trip
# ---------------------------------------------------------------------------


def _write_legacy_dump(root: str, obj, observations, model_desc, model_pts):
    """Hand-build a reference-format dump: one model doc + one doc per
    observation, attachments in the exact formats a reference install
    produces."""
    mdir = os.path.join(root, "model_obj0")
    os.makedirs(mdir)
    with open(os.path.join(mdir, "doc.json"), "w") as f:
        json.dump({"Type": "Model", "object_id": obj.object_id,
                   "method": "TOD"}, f)
    with open(os.path.join(mdir, "descriptors"), "wb") as f:
        f.write(encode_legacy_mat(model_desc))
    with open(os.path.join(mdir, "points"), "wb") as f:
        f.write(encode_legacy_mat(model_pts.reshape(1, -1, 3)))
    for i, obs in enumerate(observations):
        odir = os.path.join(root, f"obs_{i:03d}")
        os.makedirs(odir)
        with open(os.path.join(odir, "doc.json"), "w") as f:
            json.dump({"Type": "Observation", "object_id": obj.object_id,
                       "frame_number": int(obs["frame_number"])}, f)
        img_bgr = cv2.cvtColor(np.asarray(obs["image"]), cv2.COLOR_RGB2BGR)
        for name, payload in (
                ("image", cv2.imencode(".png", img_bgr)[1].tobytes()),
                ("depth", cv2.imencode(
                    ".png", np.asarray(obs["depth"]))[1].tobytes()),
                ("mask", cv2.imencode(
                    ".png", np.asarray(obs["mask"]))[1].tobytes()),
                ("K", encode_legacy_mat(np.asarray(obs["K"], np.float64))),
                ("R", encode_legacy_mat(np.asarray(obs["R"], np.float64))),
                ("T", encode_legacy_mat(
                    np.asarray(obs["T"], np.float64).reshape(1, 3)))):
            with open(os.path.join(odir, name), "wb") as f:
                f.write(payload)


def test_migrate_dump_then_train_and_serve(tmp_path):
    obj = SyntheticObject.make("legacy_obj", seed=11)
    observations = turntable_observations(obj, n_views=4,
                                          elevations_deg=(60.0,))
    rng = np.random.default_rng(5)
    model_desc = rng.integers(0, 256, (120, 32), np.uint8)
    model_pts = rng.random((120, 3)).astype(np.float32) * 0.2

    dump = str(tmp_path / "dump")
    os.makedirs(dump)
    _write_legacy_dump(dump, obj, observations, model_desc, model_pts)

    # one command: legacy dump -> tod_tpu filesystem store
    dst = {"type": "filesystem", "root": str(tmp_path / "db"),
           "collection": "migrated"}
    stats = migrate_db.migrate(migrate_db.iter_dump(dump), json.dumps(dst))
    assert stats["documents"] == 1 + len(observations)
    assert stats["skipped"] == 0

    db = FilesystemDb(dst["root"], dst["collection"])

    # the pre-trained legacy model loads exactly
    models = load_models_for_objects(db, [obj.object_id])
    assert len(models) == 1
    np.testing.assert_array_equal(models[0].descriptors, model_desc)
    np.testing.assert_allclose(models[0].points, model_pts, atol=1e-6)

    # ... and the migrated observations RE-TRAIN through the real pipeline
    # (the "trains after one command" claim): descriptors must match a
    # model trained from the pristine observations bit-for-bit (PNG is
    # lossless), points to calibration-print precision
    trainer = TodTrainer(
        "trainer", object_id=obj.object_id,
        json_db=json.dumps(dst),
        json_feature_params=json.dumps({"type": "ORB", "n_features": 300}))
    trainer.process()
    models = load_models_for_objects(db, [obj.object_id])
    trained = [m for m in models
               if not np.array_equal(m.descriptors, model_desc)]
    assert trained, "training from the migrated store produced no new model"
    assert trained[0].n_points > 50

    from tod_tpu.db import InMemoryDb, insert_observation
    InMemoryDb.reset_shared()
    ref_db = InMemoryDb.shared("pristine")
    for obs in observations:
        insert_observation(ref_db, obj.object_id, obs["frame_number"],
                           obs["image"], obs["depth"], obs["mask"],
                           obs["K"], obs["R"], obs["T"])
    ref_trainer = TodTrainer(
        "trainer", object_id=obj.object_id,
        json_db=json.dumps({"type": "mem", "collection": "pristine"}),
        json_feature_params=json.dumps({"type": "ORB", "n_features": 300}))
    ref_trainer.process()
    ref_model = load_models_for_objects(ref_db, [obj.object_id])[0]
    np.testing.assert_array_equal(trained[0].descriptors,
                                  ref_model.descriptors)
    np.testing.assert_allclose(trained[0].points, ref_model.points,
                               atol=1e-9)


def test_migrate_inline_base64_export(tmp_path):
    """The `_all_docs?include_docs=true&attachments=true` export shape:
    one JSON file per doc with inline base64 attachments."""
    import base64

    desc = np.random.default_rng(6).integers(0, 256, (30, 32), np.uint8)
    pts = np.random.default_rng(7).random((1, 30, 3)).astype(np.float32)
    dump = str(tmp_path / "dump")
    os.makedirs(dump)
    doc = {"_id": "m0", "_rev": "1-abc", "Type": "Model",
           "object_id": "objX", "method": "TOD",
           "_attachments": {
               "descriptors": {"content_type": "text/x-yaml",
                               "data": base64.b64encode(
                                   encode_legacy_mat(desc)).decode()},
               "points": {"content_type": "text/x-yaml",
                          "data": base64.b64encode(
                              encode_legacy_mat(pts)).decode()}}}
    with open(os.path.join(dump, "m0.json"), "w") as f:
        json.dump(doc, f)
    dst = {"type": "filesystem", "root": str(tmp_path / "db"),
           "collection": "migrated"}
    stats = migrate_db.migrate(migrate_db.iter_dump(dump), json.dumps(dst))
    assert stats == {"documents": 1, "attachments": 2, "skipped": 0}
    db = FilesystemDb(dst["root"], dst["collection"])
    models = load_models_for_objects(db, ["objX"])
    assert len(models) == 1 and models[0].n_points == 30
    np.testing.assert_array_equal(models[0].descriptors, desc)
