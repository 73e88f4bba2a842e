"""Multi-process serving tier (comlake_core_spark/serving.py): SO_REUSEPORT
read workers must be indistinguishable from the primary — same responses on
every endpoint, no stale snapshot reads after mutations, full API coverage
via proxying.  Requests here hit whichever process the kernel picks, so each
check is issued over MANY fresh connections to exercise all workers."""

import json
import urllib.error
import urllib.request

import pytest

from comlake_core_spark.catalog import Catalog
from comlake_core_spark.server import ComlakeServer
from comlake_core_spark.serving import ServingTier
from comlake_core_spark.store import LocalStore

N_WORKERS = 3


@pytest.fixture(scope="module")
def tier(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("tier")
    primary = ComlakeServer(
        spark,
        LocalStore(str(root / "cas")),
        Catalog(spark, str(root / "cat")),
        port=0,
        reuse_port=True,
        snapshot_export=str(root / "find.snap"),
    )
    t = ServingTier(primary, n_workers=N_WORKERS)
    t.start()
    yield t
    t.stop()


def call(tier, method, path, body=None, content_type="application/json"):
    # fresh connection per call → kernel assigns an arbitrary tier process
    url = f"http://127.0.0.1:{tier.primary.port}{path}"
    req = urllib.request.Request(url, data=body, method=method)
    if body is not None:
        req.add_header("Content-Type", content_type)
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def jcall(tier, method, path, body=None, **kw):
    status, raw = call(tier, method, path, body, **kw)
    return status, json.loads(raw)


REPEAT = 4 * (N_WORKERS + 1)  # enough fresh connections to hit every process w.h.p.


def test_upload_then_download_from_every_process(tier):
    status, doc = jcall(tier, "POST", "/file", b"tier-bytes", content_type="text/plain")
    assert status == 200
    cid = doc["cid"]
    for _ in range(REPEAT):
        status, raw = call(tier, "GET", f"/file/{cid}")
        assert (status, raw) == (200, b"tier-bytes")


def test_find_identical_across_processes_and_after_mutation(tier):
    status, doc = jcall(tier, "POST", "/file", b"ds-1", content_type="text/plain")
    cid1 = doc["cid"]
    status, doc = jcall(
        tier,
        "POST",
        "/dataset",
        json.dumps(
            {"file": cid1, "description": "tier-ds", "source": "tier", "topics": ["t"]}
        ).encode(),
    )
    assert status == 200
    ast = ["==", [".", ["$"], "source"], "tier"]
    results = set()
    for _ in range(REPEAT):
        status, rows = jcall(tier, "POST", "/find", json.dumps(ast).encode())
        assert status == 200
        results.add(json.dumps(sorted(rows, key=lambda d: d["id"]), sort_keys=True))
    assert len(results) == 1, "processes disagree on /find"
    assert json.loads(next(iter(results)))[0]["description"] == "tier-ds"

    # mutation through an arbitrary process (workers proxy to the primary);
    # NO process may serve the pre-mutation snapshot afterwards
    status, doc = jcall(tier, "POST", "/file", b"ds-2", content_type="text/plain")
    cid2 = doc["cid"]
    status, doc2 = jcall(
        tier,
        "POST",
        "/dataset",
        json.dumps(
            {"file": cid2, "description": "tier-ds-2", "source": "tier", "topics": []}
        ).encode(),
    )
    assert status == 200
    for _ in range(REPEAT):
        status, rows = jcall(tier, "POST", "/find", json.dumps(ast).encode())
        assert status == 200
        assert {r["description"] for r in rows} == {"tier-ds", "tier-ds-2"}


def test_snapshot_unsafe_find_proxies_to_spark(tier):
    # arithmetic predicate → not snapshot_safe → worker must proxy;
    # answer must still be correct from every process
    ast = ["==", [".", ["$"], "description"], ["+", "tier-", "ds"]]
    for _ in range(N_WORKERS + 1):
        status, rows = jcall(tier, "POST", "/find", json.dumps(ast).encode())
        assert status == 200
        assert [r["description"] for r in rows] == ["tier-ds"]


def test_malformed_and_404_from_every_process(tier):
    for _ in range(REPEAT):
        status, err = jcall(tier, "POST", "/find", b"not json{")
        assert status == 400 and err == {"error": "malformed query"}
        status, err = jcall(tier, "POST", "/find", json.dumps(["~", [".", ["$"], "cid"], "("]).encode())
        assert status == 400 and err == {"error": "malformed query"}
        status, err = jcall(tier, "GET", "/nope")
        assert status == 404 and err == {"error": "unsupported"}
        status, err = jcall(tier, "GET", "/file/QmMissing")
        assert status == 404 and err == {"error": "content not found"}


def test_dir_flow_through_tier(tier):
    status, doc = jcall(tier, "POST", "/dir")
    assert status == 200
    dir_cid = doc["cid"]
    status, doc = jcall(tier, "POST", "/file", b"member", content_type="text/plain")
    file_cid = doc["cid"]
    status, doc = jcall(
        tier, "POST", "/cp", json.dumps({"src": file_cid, "dest": dir_cid, "path": "m.txt"}).encode()
    )
    assert status == 200
    new_dir = doc["cid"]
    for _ in range(REPEAT):
        status, listing = jcall(tier, "GET", f"/dir/{new_dir}")
        assert status == 200 and listing == {"m.txt": file_cid}


def test_tier_rejects_non_local_store(spark, tmp_path):
    """ADVICE r3: workers re-open the store by .root, so a non-LocalStore
    primary must fail at construction with a clear error, not AttributeError
    in start() (or worse, silently serve the wrong backend)."""

    class FakeIpfsStore:
        root = None  # even an attribute named root must not fool the check

    primary = ComlakeServer(
        spark,
        FakeIpfsStore(),
        Catalog(spark, str(tmp_path / "cat")),
        port=0,
        reuse_port=True,
        snapshot_export=str(tmp_path / "find.snap"),
    )
    with pytest.raises(ValueError, match="LocalStore"):
        ServingTier(primary, n_workers=1)


def test_workers_serve_duckdb_fallback_locally_and_fresh(tier):
    """Snapshot-unsafe predicates are served worker-locally by the DuckDB
    middle tier (VERDICT r8 #2) with Spark-path answers, from EVERY
    process, and mutations are visible on the very next request (the
    finder re-resolves the catalog version per request)."""
    status, doc = jcall(tier, "POST", "/file", b"duck-tier", content_type="text/plain")
    assert status == 200
    cid = doc["cid"]
    status, d1 = jcall(tier, "POST", "/dataset", json.dumps({
        "file": cid, "description": "duck", "source": "dt", "topics": [],
        "length": "7",
    }).encode())
    assert status == 200

    # '+' with an extras operand: snapshot-unsafe → DuckDB tier
    ast = json.dumps(["&", [">", ["+", [".", ["$"], "length"], 1], 7],
                           ["==", [".", ["$"], "source"], "dt"]]).encode()
    from comlake_core_spark.server import duckdb_find_safe, snapshot_safe
    assert not snapshot_safe(json.loads(ast)) and duckdb_find_safe(json.loads(ast))
    for _ in range(REPEAT):
        status, hits = jcall(tier, "POST", "/find", ast)
        assert status == 200
        assert [h["id"] for h in hits] == [d1["id"]]

    # mutation → next fallback find (any process) sees the new row
    status, d2 = jcall(tier, "POST", "/dataset", json.dumps({
        "file": cid, "description": "duck2", "source": "dt", "topics": [],
        "length": "9",
    }).encode())
    assert status == 200
    for _ in range(REPEAT):
        status, hits = jcall(tier, "POST", "/find", ast)
        assert status == 200
        assert sorted(h["id"] for h in hits) == sorted([d1["id"], d2["id"]])


def test_residual_find_memoized_and_mutation_fresh(tier):
    """Residual predicates (no worker tier serves them — here a
    multi-operand mixed chain normalization skips) proxy to the primary
    ONCE per (catalog versions, AST) per worker, then answer from the
    worker memo; a mutation changes the version tokens so the next
    request re-proxies and reflects the new data (VERDICT r9 #4)."""
    status, doc = jcall(tier, "POST", "/file", b"resid-tier", content_type="text/plain")
    assert status == 200
    cid = doc["cid"]
    status, d1 = jcall(tier, "POST", "/dataset", json.dumps({
        "file": cid, "description": "resid", "source": "rs", "topics": [],
    }).encode())
    assert status == 200
    ast = ["==", [".", ["$"], "id"], str(d1["id"]), str(d1["id"])]
    from comlake_core_spark.server import duckdb_find_safe, snapshot_safe
    assert not snapshot_safe(ast) and not duckdb_find_safe(ast)
    body = json.dumps(ast).encode()
    for _ in range(REPEAT):
        status, hits = jcall(tier, "POST", "/find", body)
        assert status == 200 and [h["id"] for h in hits] == [d1["id"]]

    # the deterministic-400 classes answer identically from every process
    for bad, msg in (
        (["==", [".", ["$"], "description", "x"], "v"], "failed query"),
        (["==", [".", ["$"], "parent"], ""], "failed query"),
    ):
        for _ in range(REPEAT):
            status, err = jcall(tier, "POST", "/find", json.dumps(bad).encode())
            assert status == 400 and err == {"error": msg}

    # mutation → version tokens advance → memo key changes → fresh rows
    status, d2 = jcall(tier, "POST", "/dataset", json.dumps({
        "file": cid, "description": "resid2", "source": "rs", "topics": [],
    }).encode())
    assert status == 200
    # id >= d1 chained with a string-equal pair: still a mixed chain
    # (residual), result now includes the new row
    ast2 = [">=", [".", ["$"], "id"], str(d1["id"]), str(d1["id"])]
    assert not snapshot_safe(ast2) and not duckdb_find_safe(ast2)
    for _ in range(REPEAT):
        status, hits = jcall(tier, "POST", "/find", json.dumps(ast2).encode())
        assert status == 200
        assert sorted(h["id"] for h in hits) == sorted([d1["id"], d2["id"]])


def test_mixed_literal_comparison_snapshot_served_by_workers(tier):
    """The r9 residual-bench predicate shape ["==", id, "1"] normalizes
    to a single-kind comparison and is served snapshot-locally by every
    process — no proxy, no Spark job (VERDICT r9 #4)."""
    status, doc = jcall(tier, "POST", "/file", b"mixed-tier", content_type="text/plain")
    cid = doc["cid"]
    status, d1 = jcall(tier, "POST", "/dataset", json.dumps({
        "file": cid, "description": "mixed", "source": "mx", "topics": [],
    }).encode())
    assert status == 200
    ast = ["==", [".", ["$"], "id"], str(d1["id"])]
    from comlake_core_spark.server import normalize_find_ast, snapshot_safe
    assert snapshot_safe(normalize_find_ast(ast))
    for _ in range(REPEAT):
        status, hits = jcall(tier, "POST", "/find", json.dumps(ast).encode())
        assert status == 200 and [h["id"] for h in hits] == [d1["id"]]
