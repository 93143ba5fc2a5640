from tod_tpu.db.document import Document
from tod_tpu.db.backends import (
    ObjectDb,
    ObjectDbParameters,
    InMemoryDb,
    FilesystemDb,
    CouchDb,
)
from tod_tpu.db.views import View, ViewIterator
from tod_tpu.db.models import (
    TodModel,
    write_model,
    load_models_for_objects,
    find_models_for_object,
    insert_observation,
    observations_for_object,
)

__all__ = [
    "Document",
    "ObjectDb",
    "ObjectDbParameters",
    "InMemoryDb",
    "FilesystemDb",
    "CouchDb",
    "View",
    "ViewIterator",
    "TodModel",
    "write_model",
    "load_models_for_objects",
    "find_models_for_object",
    "insert_observation",
    "observations_for_object",
]
