"""Document store tests: all three backends share one behavioral contract.

The CouchDB backend is exercised against a minimal in-process HTTP server that
emulates the CouchDB REST endpoints the backend uses.
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from tod_tpu.db import (
    CouchDb,
    Document,
    FilesystemDb,
    InMemoryDb,
    ObjectDbParameters,
    TodModel,
    find_models_for_object,
    insert_observation,
    load_models_for_objects,
    observations_for_object,
    write_model,
)


# ---------------------------------------------------------------------------
# Minimal CouchDB-dialect server (fixture only)
# ---------------------------------------------------------------------------


class _FakeCouchHandler(BaseHTTPRequestHandler):
    store = {}  # {db: {docid: {"fields":..., "rev":int, "atts":{name:bytes}}}}

    def log_message(self, *args):
        pass

    def _send(self, code, body=b"{}", ctype="application/json"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _parts(self):
        path, _, query = self.path.partition("?")
        return [p for p in path.split("/") if p], query

    def do_PUT(self):
        parts, query = self._parts()
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length) if length else b""
        if len(parts) == 1:  # create db
            if parts[0] in self.store:
                return self._send(412, b'{"error":"file_exists"}')
            self.store[parts[0]] = {}
            return self._send(201, b'{"ok":true}')
        if len(parts) == 2:  # put doc
            db, docid = parts
            fields = json.loads(body)
            fields.pop("_rev", None)
            doc = self.store[db].setdefault(docid, {"rev": 0, "atts": {}})
            doc["fields"] = fields
            doc["rev"] += 1
            return self._send(
                201, json.dumps({"ok": True, "id": docid,
                                 "rev": f"{doc['rev']}-x"}).encode())
        if len(parts) == 3:  # put attachment
            db, docid, name = parts
            doc = self.store[db][docid]
            doc["atts"][name] = body
            doc["rev"] += 1
            return self._send(
                201, json.dumps({"ok": True, "id": docid,
                                 "rev": f"{doc['rev']}-x"}).encode())
        self._send(400)

    def do_GET(self):
        parts, _ = self._parts()
        if len(parts) == 2 and parts[1] == "_all_docs":
            db = parts[0]
            rows = [{"id": d} for d in sorted(self.store.get(db, {}))]
            return self._send(200, json.dumps({"rows": rows}).encode())
        if len(parts) == 2:
            db, docid = parts
            if docid not in self.store.get(db, {}):
                return self._send(404, b'{"error":"not_found"}')
            doc = self.store[db][docid]
            out = dict(doc["fields"])
            out["_id"] = docid
            out["_rev"] = f"{doc['rev']}-x"
            if doc["atts"]:
                out["_attachments"] = {n: {"stub": True} for n in doc["atts"]}
            return self._send(200, json.dumps(out).encode())
        if len(parts) == 3:
            db, docid, name = parts
            blob = self.store[db][docid]["atts"][name]
            return self._send(200, blob, ctype="application/octet-stream")
        self._send(400)

    def do_DELETE(self):
        parts, _ = self._parts()
        if len(parts) == 2:
            db, docid = parts
            self.store.get(db, {}).pop(docid, None)
            return self._send(200, b'{"ok":true}')
        self._send(400)


@pytest.fixture
def couch_url():
    _FakeCouchHandler.store = {}
    server = ThreadingHTTPServer(("127.0.0.1", 0), _FakeCouchHandler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


# ---------------------------------------------------------------------------
# Shared backend contract
# ---------------------------------------------------------------------------


def _roundtrip(db):
    doc = Document(fields={"Type": "Model", "object_id": "obj1",
                           "method": "TOD"})
    doc.set_attachment("descriptors", np.arange(64, dtype=np.uint8).reshape(2, 32))
    doc.set_attachment("points", np.ones((1, 2, 3), np.float32))
    doc_id = db.insert(doc)
    assert doc_id

    loaded = db.load(doc_id)
    assert loaded.fields["object_id"] == "obj1"
    np.testing.assert_array_equal(loaded.get_attachment("descriptors"),
                                  doc.get_attachment("descriptors"))
    assert loaded.get_attachment("points").shape == (1, 2, 3)

    assert doc_id in db.all_ids()
    found = list(db.query(object_id="obj1"))
    assert len(found) == 1

    db.delete(doc_id)
    assert doc_id not in db.all_ids()


def test_inmemory_roundtrip():
    _roundtrip(InMemoryDb("t"))


def test_filesystem_roundtrip(tmp_path):
    _roundtrip(FilesystemDb(str(tmp_path), "t"))


def test_couchdb_roundtrip(couch_url):
    _roundtrip(CouchDb(couch_url, "t"))


def test_parameters_factory(tmp_path, couch_url):
    assert isinstance(
        ObjectDbParameters('{"type": "mem"}').generate_db(), InMemoryDb)
    assert isinstance(
        ObjectDbParameters({"type": "filesystem",
                            "root": str(tmp_path)}).generate_db(), FilesystemDb)
    db = ObjectDbParameters({"type": "CouchDB", "root": couch_url}).generate_db()
    assert isinstance(db, CouchDb)
    # shared in-memory collections alias each other
    a = ObjectDbParameters('{"type": "mem", "collection": "c1"}').generate_db()
    b = ObjectDbParameters('{"type": "mem", "collection": "c1"}').generate_db()
    assert a is b


def test_model_write_load(tmp_path):
    db = FilesystemDb(str(tmp_path))
    desc = np.random.default_rng(0).integers(0, 256, (10, 32), dtype=np.uint8)
    pts = np.random.default_rng(1).normal(size=(10, 3)).astype(np.float32)
    write_model(db, "objA", desc, pts)
    write_model(db, "objB", desc[:5], pts[:5])

    models = load_models_for_objects(db, "all")
    assert [m.object_id for m in models] == ["objA", "objB"]
    np.testing.assert_array_equal(models[0].descriptors, desc)
    np.testing.assert_allclose(models[0].points, pts)

    only_b = find_models_for_object(db, "objB")
    assert len(only_b) == 1 and only_b[0].n_points == 5


def test_model_span():
    pts = np.array([[0, 0, 0], [1, 2, 2]], np.float32)
    m = TodModel("x", np.zeros((2, 32), np.uint8), pts)
    assert np.isclose(m.span, 3.0)  # sqrt(1+4+4)


def test_observation_roundtrip():
    db = InMemoryDb("obs")
    img = np.zeros((48, 64, 3), np.uint8)
    depth = np.full((48, 64), 0.7, np.float32)
    mask = np.ones((48, 64), np.uint8)
    K = np.eye(3)
    for frame in (1, 0, 2):
        insert_observation(db, "obj", frame, img, depth, mask, K,
                           np.eye(3), np.zeros(3))
    obs = observations_for_object(db, "obj")
    assert [o.frame_number for o in obs] == [0, 1, 2]  # sorted turntable order
    assert obs[0].depth.dtype == np.float32
    assert obs[0].T.shape == (3,)


def test_filesystem_update_in_place_drops_stale_attachments(tmp_path):
    """Regression: re-inserting a document without an attachment must remove
    the stale .npy file, or load() resurrects it (checkpoint corruption)."""
    db = FilesystemDb(str(tmp_path), "test")
    doc = Document(fields={"kind": "m"},
                   attachments={"a": np.arange(3), "b": np.arange(4)})
    doc_id = db.insert(doc)
    doc2 = db.load(doc_id)
    del doc2.attachments["b"]
    doc2.attachments["a"] = np.arange(5)
    db.insert(doc2)
    loaded = db.load(doc_id)
    assert set(loaded.attachments) == {"a"}
    assert len(loaded.attachments["a"]) == 5
