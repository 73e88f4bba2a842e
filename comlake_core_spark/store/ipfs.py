"""IPFS content store over the HTTP API + gateway.

The Spark-side "IPFS connector" (BASELINE.json north star): content CIDs
resolve to HTTP gateway URLs that Spark's readers can open, while writes go
through the daemon's /api/v0 RPC — the same endpoints the reference calls
through java-ipfs-http-client (reference
src/comlake/core/fs/InterPlanetaryFileSystem.java:47-121; multiaddr config
reference Configuration.java:39).

This adapter is import-safe without a daemon; every call raises
StoreUnavailable if the API endpoint can't be reached, and tests exercise
the request construction against a stub transport.

Scale note: for bulk reads, fetch-to-local-then-spark.read is wrong at
100 TB; spark_path returns gateway URLs so executors stream directly from
gateway nodes (put gateways next to executors, the way s3a puts S3 close).
"""

from __future__ import annotations

import io
import json
import urllib.error
import urllib.request
import uuid
from typing import BinaryIO, Callable

from comlake_core_spark.store.base import ContentStore

# IPFS's well-known empty directory CID, hardcoded exactly like the
# reference (InterPlanetaryFileSystem.java:42-44).
EMPTY_DIR_CID = "QmUNLLsPACCz1vLxQVkXqqLX5R1X345qqfHbsf67hvA3Nn"


class StoreUnavailable(RuntimeError):
    pass


def _default_transport(url: str, data: bytes | None = None, headers: dict | None = None) -> bytes:
    req = urllib.request.Request(url, data=data, headers=headers or {}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.read()
    except (urllib.error.URLError, OSError) as exc:
        raise StoreUnavailable(f"IPFS API unreachable at {url}: {exc}") from exc


class IpfsStore(ContentStore):
    def __init__(
        self,
        api_base: str = "http://127.0.0.1:5001",
        gateway_base: str = "http://127.0.0.1:8080",
        transport: Callable[..., bytes] | None = None,
    ):
        self.api = api_base.rstrip("/") + "/api/v0"
        self.gateway = gateway_base.rstrip("/")
        self._post = transport or _default_transport

    # -- multipart upload (the one non-trivial HTTP bit) -------------------

    def _multipart(self, data: bytes) -> tuple[bytes, str]:
        boundary = uuid.uuid4().hex
        body = (
            f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="file"; filename="blob"\r\n'
            "Content-Type: application/octet-stream\r\n\r\n"
        ).encode() + data + f"\r\n--{boundary}--\r\n".encode()
        return body, f"multipart/form-data; boundary={boundary}"

    # -- ContentStore ------------------------------------------------------

    def add(self, stream: BinaryIO) -> str:
        body, ctype = self._multipart(stream.read())
        raw = self._post(f"{self.api}/add?pin=true", data=body, headers={"Content-Type": ctype})
        return json.loads(raw.decode().splitlines()[-1])["Hash"]

    def fetch(self, cid: str) -> BinaryIO:
        return io.BytesIO(self._post(f"{self.api}/cat?arg={cid}"))

    def mkdir(self) -> str:
        return EMPTY_DIR_CID

    def _stat(self, path: str) -> dict | None:
        """files/stat, None on failure — the reference's `stat`
        (InterPlanetaryFileSystem.java:58-68)."""
        try:
            return json.loads(self._post(f"{self.api}/files/stat?arg={path}"))
        except StoreUnavailable:
            return None

    def is_directory(self, cid: str) -> bool:
        """The reference's `isdir` (InterPlanetaryFileSystem.java:70-74):
        files/stat Type — the ONLY reliable discriminator.  Inferring from
        /ls link shape is wrong: an EMPTY directory and a small single-
        block file both list zero named links (divergence caught by the
        fake-daemon suite in round 3 — cp into a fresh mkdir() failed)."""
        st = self._stat(f"/ipfs/{cid}")
        return st is not None and st.get("Type") == "directory"

    def cp(self, src_cid: str, dest_dir_cid: str, name: str) -> str | None:
        """Immutable dir derivation via the MFS temp-dir dance the reference
        does (InterPlanetaryFileSystem.java:81-97): cp dest into a scratch
        MFS path, cp src under it, stat for the new CID, pin, clean up."""
        if not self.is_directory(dest_dir_cid):
            return None
        tmp = f"/comlake-{uuid.uuid4().hex}"
        try:
            self._post(f"{self.api}/files/cp?arg=/ipfs/{dest_dir_cid}&arg={tmp}")
            self._post(f"{self.api}/files/cp?arg=/ipfs/{src_cid}&arg={tmp}/{name}")
            raw = self._post(f"{self.api}/files/stat?arg={tmp}")
            new_cid = json.loads(raw)["Hash"]
            self._post(f"{self.api}/pin/add?arg={new_cid}")
            return new_cid
        finally:
            try:
                self._post(f"{self.api}/files/rm?arg={tmp}&recursive=true")
            except StoreUnavailable:
                pass

    def ls(self, cid: str) -> dict[str, str] | None:
        """Directory listing, None for non-directories — isdir-gated like
        the reference (InterPlanetaryFileSystem.java:99-105), so an EMPTY
        directory correctly lists as {} instead of None."""
        if not self.is_directory(cid):
            return None
        raw = self._post(f"{self.api}/ls?arg={cid}")
        doc = json.loads(raw)
        objs = doc.get("Objects") or []
        links = (objs[0].get("Links") or []) if objs else []
        return {l["Name"]: l["Hash"] for l in links if l.get("Name")}

    def gateway_url(self, cid: str) -> str:
        return f"{self.gateway}/ipfs/{cid}"

    def spark_path(self, cid: str) -> str:
        """A path spark.read can actually open. Plain Spark has NO http://
        Hadoop filesystem, so handing out the gateway URL would fail at scan
        time; instead, fetch through the daemon into a local content cache
        (CID-keyed → idempotent, immutable) and return a file:// path.

        This is the single-node story. At 100 TB the fetch-to-driver hop is
        the wrong shape — the deployment options, in preference order:
        (1) mount IPFS via FUSE/ipfs-mount on every executor and return the
        mount path; (2) run gateways beside executors and install an
        http Hadoop FileSystem (e.g. hadoop-connectors' HttpFileSystem);
        (3) mirror pinned CIDs into an object store keyed by CID (what
        LocalStore models). The interface stays `cid -> readable path`
        either way."""
        import os
        import tempfile

        cache = os.path.join(tempfile.gettempdir(), "comlake-ipfs-cache")
        os.makedirs(cache, exist_ok=True)
        local = os.path.join(cache, cid.replace("/", "_"))
        if not os.path.exists(local):
            tmp = f"{local}.{uuid.uuid4().hex}.tmp"
            with self.fetch(cid) as src, open(tmp, "wb") as dst:
                dst.write(src.read())
            os.replace(tmp, local)
        return "file://" + local
