"""Opt-in LIVE IPFS integration: the same daemon-backed exercise the
reference runs in CI (/root/reference/.build.yml:10-24 boots `ipfs daemon`
before `lein test`). Skipped unless COMLAKE_IPFS_API points at a reachable
daemon — the sandbox has none, so these document CI-readiness rather than
run here; the transport-level protocol (multipart /add, /cat, MFS cp
dance, /ls) is pinned against a stub in test_ipfs_store.py either way.

Run against a real daemon with:
    ipfs daemon --init &
    COMLAKE_IPFS_API=http://127.0.0.1:5001 python -m pytest tests/test_ipfs_live.py
"""

import io
import os
import urllib.error
import urllib.request

import pytest

from comlake_core_spark.store.ipfs import IpfsStore

API = os.environ.get("COMLAKE_IPFS_API")


def _daemon_reachable() -> bool:
    if not API:
        return False
    try:
        req = urllib.request.Request(API.rstrip("/") + "/api/v0/version", method="POST")
        with urllib.request.urlopen(req, timeout=3):
            return True
    except (urllib.error.URLError, OSError):
        return False


pytestmark = pytest.mark.skipif(
    not _daemon_reachable(), reason="no live IPFS daemon (set COMLAKE_IPFS_API)"
)


@pytest.fixture(scope="module")
def store():
    return IpfsStore(api_base=API)


def test_add_fetch_roundtrip(store):
    payload = b"comlake live ipfs roundtrip\n"
    cid = store.add(io.BytesIO(payload))
    assert cid
    with store.fetch(cid) as f:
        assert f.read() == payload


def test_mkdir_cp_ls(store):
    payload = b"file-in-dir\n"
    file_cid = store.add(io.BytesIO(payload))
    dir_cid = store.mkdir()
    new_dir = store.cp(file_cid, dir_cid, "data.bin")
    assert new_dir and new_dir != dir_cid
    entries = store.ls(new_dir)
    assert entries == {"data.bin": file_cid}


def test_cp_into_file_fails(store):
    file_cid = store.add(io.BytesIO(b"not a dir"))
    assert store.cp(file_cid, file_cid, "x") is None
