#!/usr/bin/env python
"""Migrate a reference-era (object_recognition_core) database into tod_tpu.

Reads a CouchDB instance or an offline dump holding the reference's
documents — trained models with cv::Mat binary attachments (``descriptors``,
``points``; written by src/training/ModelFiller.cpp:23-24, read by
src/detection/DescriptorMatcher.cpp:74-86) and capture observations with
PNG / depth / calibration attachments — decodes every attachment with
tod_tpu.db.legacy, and rewrites the documents into a tod_tpu backend as
native npy attachments.  Fields (Type / object_id / method / frame_number /
...) pass through unchanged, so the migrated DB serves tod_tpu's views
(tod_tpu/db/views.py) directly: a reference user's existing trained-model
database trains/serves after this one command.

Usage:
  # from a live CouchDB (the reference's default deployment)
  python tools/migrate_db.py --src http://localhost:5984/object_recognition \
      --dst '{"type": "filesystem", "root": "~/tod_db", \
              "collection": "object_recognition"}'

  # from an offline dump directory (<dump>/<docid>/doc.json + attachment
  # blobs, or <dump>/<docid>.json with inline base64 _attachments — the
  # shape `GET _all_docs?include_docs=true&attachments=true` exports)
  python tools/migrate_db.py --src /path/to/dump --dst '{"type": ...}'

Note tod_tpu's backends also decode legacy attachments transparently at
load time (tod_tpu/db/document.py decode_array); migrating is the
performance option — decode once, serve npy forever.
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import sys
from typing import Dict, Iterator, Tuple
from urllib import request as _urlrequest

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tod_tpu.db import Document, ObjectDbParameters  # noqa: E402
from tod_tpu.db.legacy import LegacyDecodeError, decode_legacy_mat  # noqa: E402

RawDoc = Tuple[str, Dict, Dict[str, bytes]]  # (id, fields, {name: blob})


def iter_couch(url: str) -> Iterator[RawDoc]:
    """Yield raw documents from a CouchDB database URL."""
    url = url.rstrip("/")

    def get(path: str) -> bytes:
        with _urlrequest.urlopen(f"{url}/{path}", timeout=60.0) as resp:
            return resp.read()

    rows = json.loads(get("_all_docs"))["rows"]
    for row in rows:
        doc_id = row["id"]
        if doc_id.startswith("_design"):
            continue
        raw = json.loads(get(doc_id))
        raw.pop("_id", None)
        raw.pop("_rev", None)
        stubs = raw.pop("_attachments", {})
        blobs = {name: get(f"{doc_id}/{name}") for name in stubs}
        yield doc_id, raw, blobs


def iter_dump(root: str) -> Iterator[RawDoc]:
    """Yield raw documents from an offline dump directory."""
    for entry in sorted(os.listdir(root)):
        path = os.path.join(root, entry)
        if os.path.isdir(path):
            meta_path = os.path.join(path, "doc.json")
            if not os.path.exists(meta_path):
                continue
            with open(meta_path) as f:
                raw = json.load(f)
            doc_id = raw.pop("_id", entry)
            raw.pop("_rev", None)
            raw.pop("_attachments", None)
            blobs = {}
            for fname in sorted(os.listdir(path)):
                if fname == "doc.json":
                    continue
                with open(os.path.join(path, fname), "rb") as f:
                    blobs[fname] = f.read()
            yield doc_id, raw, blobs
        elif entry.endswith(".json"):
            with open(path) as f:
                raw = json.load(f)
            doc_id = raw.pop("_id", entry[:-5])
            raw.pop("_rev", None)
            stubs = raw.pop("_attachments", {})
            blobs = {name: base64.b64decode(stub["data"])
                     for name, stub in stubs.items() if "data" in stub}
            yield doc_id, raw, blobs


def migrate(source: Iterator[RawDoc], dst_params: str,
            keep_ids: bool = True) -> Dict[str, int]:
    dst = ObjectDbParameters(dst_params).generate_db()
    stats = {"documents": 0, "attachments": 0, "skipped": 0}
    for doc_id, fields, blobs in source:
        attachments: Dict[str, np.ndarray] = {}
        ok = True
        for name, blob in blobs.items():
            try:
                attachments[name] = decode_legacy_mat(blob)
            except LegacyDecodeError as e:
                print(f"  SKIP {doc_id}: attachment {name!r} undecodable "
                      f"({e})", file=sys.stderr)
                ok = False
                break
        if not ok:
            stats["skipped"] += 1
            continue
        doc = Document(id=doc_id if keep_ids else None, fields=fields,
                       attachments=attachments)
        dst.insert(doc)
        stats["documents"] += 1
        stats["attachments"] += len(attachments)
        t = fields.get("Type", "?")
        oid = fields.get("object_id", "?")
        print(f"  migrated {doc_id} (Type={t}, object_id={oid}, "
              f"{len(attachments)} attachments)", file=sys.stderr)
    return stats


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--src", required=True,
                    help="CouchDB database URL (http://host:5984/dbname) or "
                         "dump directory path")
    ap.add_argument("--dst", required=True,
                    help="tod_tpu DB parameter JSON "
                         "({'type': 'filesystem'|'CouchDB'|'mem', ...})")
    ap.add_argument("--new-ids", action="store_true",
                    help="assign fresh document ids instead of keeping the "
                         "source ids")
    args = ap.parse_args()
    source = (iter_couch(args.src) if args.src.startswith("http")
              else iter_dump(args.src))
    stats = migrate(source, args.dst, keep_ids=not args.new_ids)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
