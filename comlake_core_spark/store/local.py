"""Local filesystem content-addressed store.

CIDs are ``sha256-<hex>`` over the content bytes (files) or over the
canonical JSON manifest (directories) — deterministic pure functions of
content, preserving the reference's IPFS properties the engine relies on:
passive dedup (same bytes → same CID, reference thesis/main/eval.tex:143-144)
and golden-CID testability (reference api_test.clj:29-44).

Directories are JSON manifests ``{name: cid}`` stored as objects themselves,
mirroring IPFS's immutable dir derivation used by cp
(reference InterPlanetaryFileSystem.java:81-97).

Layout: ``<root>/objects/<cid>`` — flat CAS. At 100 TB the same interface
fronts an object store (s3a://bucket/objects/<cid>); spark_path returns
whatever URI scheme the store lives on, and Spark's reader parallelizes over
the blocks.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid
from typing import BinaryIO

from comlake_core_spark.store.base import ContentStore

_DIR_MARKER = "application/x-comlake-directory"


class LocalStore(ContentStore):
    def __init__(self, root: str):
        self.root = root
        self.objects = os.path.join(root, "objects")
        os.makedirs(self.objects, exist_ok=True)

    # -- internal helpers --------------------------------------------------

    def _path(self, cid: str) -> str:
        if "/" in cid or ".." in cid:
            raise ValueError(f"invalid cid: {cid!r}")
        return os.path.join(self.objects, cid)

    def _put_bytes(self, data: bytes) -> str:
        cid = "sha256-" + hashlib.sha256(data).hexdigest()
        path = self._path(cid)
        if not os.path.exists(path):  # passive dedup: same bytes, same object
            tmp = f"{path}.{uuid.uuid4().hex}.tmp"  # writer-unique temp
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)
        return cid

    # -- ContentStore ------------------------------------------------------

    def add(self, stream: BinaryIO) -> str:
        hasher = hashlib.sha256()
        # writer-unique temp: concurrent ingests must not share scratch
        tmp = os.path.join(self.objects, f".ingest.{uuid.uuid4().hex}.tmp")
        with open(tmp, "wb") as out:
            while chunk := stream.read(1 << 20):
                hasher.update(chunk)
                out.write(chunk)
        cid = "sha256-" + hasher.hexdigest()
        path = self._path(cid)
        if os.path.exists(path):
            os.remove(tmp)
        else:
            os.replace(tmp, path)
        return cid

    def add_bytes(self, data: bytes) -> str:
        return self._put_bytes(data)

    def fetch(self, cid: str) -> BinaryIO:
        return open(self._path(cid), "rb")

    def mkdir(self) -> str:
        # the empty manifest has a well-known CID, like IPFS's hardcoded
        # empty-dir (reference InterPlanetaryFileSystem.java:42-44)
        return self._put_bytes(self._manifest_bytes({}))

    def _manifest_bytes(self, entries: dict[str, str]) -> bytes:
        # "type" first so ls() can sniff the marker in the first few bytes;
        # entries sorted for a deterministic (golden-testable) CID
        ordered = {"type": _DIR_MARKER, "entries": dict(sorted(entries.items()))}
        return json.dumps(ordered).encode()

    def ls(self, cid: str) -> dict[str, str] | None:
        try:
            with self.fetch(cid) as f:
                head = f.read(len(_DIR_MARKER) + 32)
                if _DIR_MARKER.encode() not in head:
                    return None
                f.seek(0)
                doc = json.load(f)
        except (OSError, json.JSONDecodeError):
            return None
        if not isinstance(doc, dict) or doc.get("type") != _DIR_MARKER:
            return None
        return dict(doc["entries"])

    def cp(self, src_cid: str, dest_dir_cid: str, name: str) -> str | None:
        entries = self.ls(dest_dir_cid)
        if entries is None:
            return None
        if not os.path.exists(self._path(src_cid)):
            return None
        entries[name] = src_cid
        return self._put_bytes(self._manifest_bytes(entries))

    def spark_path(self, cid: str) -> str:
        return "file://" + self._path(cid)

    # -- maintenance -------------------------------------------------------

    def destroy(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
