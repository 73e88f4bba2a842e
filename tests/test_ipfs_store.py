"""IpfsStore request-construction tests against a stub transport (no daemon
in this environment; the adapter mirrors the reference's HTTP calls,
InterPlanetaryFileSystem.java:47-121)."""

import io
import json

import pytest

from comlake_core_spark.store.ipfs import EMPTY_DIR_CID, IpfsStore, StoreUnavailable


class StubTransport:
    def __init__(self):
        self.calls = []
        self.responses = {}

    def __call__(self, url, data=None, headers=None):
        self.calls.append((url, data, headers))
        for key, resp in self.responses.items():
            if key in url:
                return resp
        raise StoreUnavailable(f"no stub for {url}")


@pytest.fixture
def stub():
    return StubTransport()


@pytest.fixture
def store(stub):
    return IpfsStore(transport=stub)


def test_add_multipart(store, stub):
    stub.responses["/add"] = json.dumps({"Name": "blob", "Hash": "QmFake", "Size": "5"}).encode()
    cid = store.add(io.BytesIO(b"hello"))
    assert cid == "QmFake"
    url, data, headers = stub.calls[0]
    assert "/api/v0/add" in url and "pin=true" in url
    assert b"hello" in data
    assert headers["Content-Type"].startswith("multipart/form-data; boundary=")


def test_fetch_cat(store, stub):
    stub.responses["/cat"] = b"content"
    assert store.fetch("QmX").read() == b"content"
    assert "/api/v0/cat?arg=QmX" in stub.calls[0][0]


def test_mkdir_is_wellknown_cid(store):
    assert store.mkdir() == EMPTY_DIR_CID


def test_ls_directory_and_file(store, stub):
    # directory-ness comes from files/stat Type, the reference's isdir
    # (InterPlanetaryFileSystem.java:70-74) — NOT from /ls link shape,
    # which cannot distinguish an empty dir from a small file
    stub.responses["/files/stat"] = json.dumps({"Hash": "QmDir", "Type": "directory"}).encode()
    stub.responses["/ls"] = json.dumps(
        {"Objects": [{"Hash": "QmDir", "Links": [{"Name": "a.csv", "Hash": "QmA", "Size": 3, "Type": 2}]}]}
    ).encode()
    assert store.ls("QmDir") == {"a.csv": "QmA"}
    # an empty directory lists as {} (round-3 parity fix)
    stub.responses["/ls"] = json.dumps({"Objects": [{"Hash": "QmEmpty", "Links": []}]}).encode()
    assert store.ls("QmEmpty") == {}
    # a plain file: stat says file → not a directory
    stub.responses["/files/stat"] = json.dumps({"Hash": "QmF", "Type": "file"}).encode()
    assert store.ls("QmF") is None


def test_cp_mfs_dance(store, stub):
    stub.responses["/files/cp"] = b"{}"
    stub.responses["/files/stat"] = json.dumps({"Hash": "QmNewDir", "Type": "directory"}).encode()
    stub.responses["/pin/add"] = b"{}"
    stub.responses["/files/rm"] = b"{}"
    assert store.cp("QmSrc", "QmDir", "name.csv") == "QmNewDir"
    ops = [u.split("/api/v0/")[1].split("?")[0] for u, _, _ in stub.calls]
    assert ops == ["files/stat", "files/cp", "files/cp", "files/stat", "pin/add", "files/rm"]


def test_unavailable_daemon_raises():
    s = IpfsStore(api_base="http://127.0.0.1:1")  # nothing listens here
    with pytest.raises(StoreUnavailable):
        s.fetch("QmX")


def test_spark_path_fetches_to_local_cache(store, stub, tmp_path):
    stub.responses["/cat"] = b"col\n1\n"
    path = store.spark_path("QmCache1")
    assert path.startswith("file://")
    with open(path[len("file://"):], "rb") as f:
        assert f.read() == b"col\n1\n"
    # second call hits the cache, no new /cat request
    n_calls = len(stub.calls)
    assert store.spark_path("QmCache1") == path
    assert len(stub.calls) == n_calls


def test_gateway_url(store):
    assert store.gateway_url("QmX") == "http://127.0.0.1:8080/ipfs/QmX"
