"""End-to-end data-lake flow tests mirroring the reference's api_test.clj:
ingest content → catalog it → find by qast (incl. dynamic extra fields) →
extract rows → infer schemas. Fixtures are synthesized to the shapes in
FIXTURES.md (population.csv-like wide CSV, nested JSON array, plain text)."""

import io
import json

import pytest

from comlake_core_spark.catalog import Catalog, MissingMetadata
from comlake_core_spark.extract import (
    UnsupportedType,
    extract,
    infer_schema_json,
    read_content,
)
from comlake_core_spark.extract.schema_infer import cached_schema
from comlake_core_spark.store import LocalStore

CSV_BODY = (
    "country_name,country_code,indicator_name,year_1960,year_2019,year_\n"
    "Vietnam,VNM,Population,32670000,96462106,\n"
    "North Vietnam legacy,XVN,Population,17000000,0,\n"
    "Germany,DEU,Population,72814900,83092962,\n"
)

JSON_BODY = json.dumps(
    [
        {"name": "lake", "deadline": {"epoch_time": 1617000000, "timezone": "+07:00"}, "students": ["a"]},
        {"name": "core", "deadline": {"epoch_time": 1618000000, "timezone": "+07:00"}, "students": ["b", "c"]},
    ]
)

TEXT_BODY = "Ho!\nHa!\n"


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    return LocalStore(str(tmp_path_factory.mktemp("cas")))


@pytest.fixture(scope="module")
def catalog(spark, tmp_path_factory):
    return Catalog(spark, str(tmp_path_factory.mktemp("catalog")))


@pytest.fixture(scope="module")
def cids(store):
    return {
        "csv": store.add_bytes(CSV_BODY.encode()),
        "json": store.add_bytes(JSON_BODY.encode()),
        "text": store.add_bytes(TEXT_BODY.encode()),
    }


def test_cid_deterministic_and_deduped(store):
    # content addressing: same bytes → same CID (the IPFS property the
    # reference's golden tests rely on, api_test.clj:29-44)
    a = store.add_bytes(b"hello world")
    b = store.add(io.BytesIO(b"hello world"))
    assert a == b and a.startswith("sha256-")


def test_dir_mkdir_cp_ls(store, cids):
    d0 = store.mkdir()
    assert store.ls(d0) == {}
    d1 = store.cp(cids["csv"], d0, "population.csv")
    assert store.ls(d1) == {"population.csv": cids["csv"]}
    # immutability: original dir unchanged
    assert store.ls(d0) == {}
    # cp onto a non-directory → None (reference 'not a directory',
    # api_test.clj:104-109)
    assert store.cp(cids["csv"], cids["text"], "x") is None
    # files are not directories
    assert store.ls(cids["csv"]) is None


def test_catalog_upsert_and_lookup(catalog, cids):
    catalog.upsert_content(cids["csv"], "text/csv")
    catalog.upsert_content(cids["json"], "application/json")
    catalog.upsert_content(cids["text"], "text/plain")
    # upsert: second write with same cid replaces, no dup
    catalog.upsert_content(cids["text"], "text/plain")
    assert catalog.get_type(cids["csv"]) == "text/csv"
    assert catalog.content().filter(f"cid = '{cids['text']}'").count() == 1


def test_dataset_add_requires_fields(catalog, cids):
    with pytest.raises(MissingMetadata):
        catalog.add_dataset({"file": cids["csv"], "description": "no source/topics"})


def test_dataset_add_find_update(catalog, cids):
    id1 = catalog.add_dataset(
        {
            "file": cids["csv"],
            "description": "World Bank population",
            "source": "https://worldbank.org",
            "topics": ["population", "statistics"],
            "language": "English",
            "length": "4096",
        }
    )
    id2 = catalog.add_dataset(
        {
            "file": cids["json"],
            "description": "projects",
            "source": "rethinkdb",
            "topics": ["projects"],
            "length": "100000",
        }
    )
    assert id2 == id1 + 1

    # find on a fixed column
    rows = catalog.find(["==", [".", ["$"], "source"], "rethinkdb"]).collect()
    assert [r["id"] for r in rows] == [id2]

    # find on a DYNAMIC extra field with numeric comparison
    # (doc/api.md:225-257: ["<", [".", ["$"], "length"], 4096])
    rows = catalog.find(["<=", [".", ["$"], "length"], 4096]).collect()
    assert [r["id"] for r in rows] == [id1]

    # find with partial regex (find-path semantics)
    rows = catalog.find(["~", [".", ["$"], "description"], "population"]).collect()
    assert [r["id"] for r in rows] == [id1]

    # array overlap on topics (qast_test.clj:35-37 shape)
    rows = catalog.find(["&&", [".", ["$"], "topics"], ["statistics", "nope"]]).collect()
    assert [r["id"] for r in rows] == [id1]

    # versioned update: new row, parent set, unspecified fields inherited
    id3 = catalog.update_dataset(id1, {"description": "World Bank population v2"})
    assert id3 == id2 + 1
    row3 = catalog.dataset().filter(f"id = {id3}").first()
    assert row3["parent"] == id1
    assert row3["source"] == "https://worldbank.org"  # inherited
    assert row3["description"] == "World Bank population v2"
    # append-only: the old revision still exists
    assert catalog.dataset().filter(f"id = {id1}").count() == 1

    # orphan update → None (api_test.clj:134-140)
    assert catalog.update_dataset(99999, {"description": "x"}) is None


def test_catalog_time_travel_and_lineage(spark, tmp_path_factory):
    from comlake_core_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path_factory.mktemp("catalog_tt")))
    d1 = cat.add_dataset(
        {"description": "v1", "source": "s", "topics": ["t"], "file": "cid-1"}
    )
    v_after_add = max(cat.snapshot_versions("dataset"))
    d2 = cat.update_dataset(d1, {"description": "v2"})
    d3 = cat.update_dataset(d2, {"description": "v3"})

    # time travel: the snapshot taken right after the add has ONE row and
    # still says v1, while the current table has all three revisions
    old = cat.dataset_as_of(v_after_add)
    assert old.count() == 1
    assert old.first()["description"] == "v1"
    assert cat.dataset().count() == 3
    # the current pointer was not disturbed by the time-travel read
    assert max(cat.snapshot_versions("dataset")) > v_after_add

    # lineage of the newest revision walks the parent chain to the root
    chain = {r["id"]: r["description"] for r in cat.lineage(d3).collect()}
    assert chain == {d1: "v1", d2: "v2", d3: "v3"}
    # lineage of the root is just the root
    assert cat.lineage(d1).count() == 1


def test_catalog_vacuum_retention(spark, tmp_path_factory):
    import pytest as _pytest

    from comlake_core_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path_factory.mktemp("catalog_vac")))
    d = cat.add_dataset({"description": "v1", "source": "s", "topics": ["t"], "file": "c"})
    for i in range(2, 6):
        d = cat.update_dataset(d, {"description": f"v{i}"})
    before = cat.snapshot_versions("dataset")
    assert len(before) == 5
    removed = cat.vacuum(keep_last=2)
    assert removed == before[:-2]
    assert cat.snapshot_versions("dataset") == before[-2:]
    # current table unaffected; pruned history no longer travelable
    assert cat.dataset().count() == 5
    with _pytest.raises(ValueError):
        cat.dataset_as_of(removed[0])


def test_extract_csv_regex_fullmatch(spark, store, cids):
    # the reference's canonical extract: 'Vi.tnam' must full-match
    # (api_test.clj:197-204) — partial would also hit 'North Vietnam legacy'
    ast = ["~", [".", ["$"], "country_name"], "Vi.tnam"]
    rows = extract(spark, store, cids["csv"], ast, "text/csv").collect()
    assert len(rows) == 1 and rows[0]["country_code"] == "VNM"
    # extraction does NOT coerce: CSV values stay strings (data.clj:23-27)
    assert rows[0]["year_2019"] == "96462106"


def test_extract_json_no_match(spark, store, cids):
    # JSON extract where predicate matches nothing (api_test.clj:205-209)
    ast = ["==", [".", ["$"], "name"], "nonexistent"]
    assert extract(spark, store, cids["json"], ast, "application/json").count() == 0


def test_extract_json_nested_field(spark, store, cids):
    ast = [">", [".", ["$"], "deadline", "epoch_time"], 1617500000]
    rows = extract(spark, store, cids["json"], ast, "application/json").collect()
    assert [r["name"] for r in rows] == ["core"]


def test_extract_unsupported_mime(spark, store, cids):
    with pytest.raises(UnsupportedType):
        read_content(spark, store, cids["text"], "text/plain")


def test_csv_schema_inference_lattice(spark, store, cids):
    # number/string lattice, blank cells don't demote (metadata.clj:41-47);
    # the all-blank trailing year_ column stays 'number'
    schema = json.loads(infer_schema_json(spark, store, cids["csv"], "text/csv"))
    props = schema["items"]["properties"]
    assert schema["$schema"] == "http://json-schema.org/draft-07/schema#"
    assert props["country_name"]["type"] == "string"
    assert props["year_1960"]["type"] == "number"
    assert props["year_2019"]["type"] == "number"
    assert props["year_"]["type"] == "number"


def test_json_schema_inference_nested(spark, store, cids):
    schema = json.loads(infer_schema_json(spark, store, cids["json"], "application/json"))
    assert schema["items"]["type"] == "object"
    props = schema["items"]["properties"]
    assert props["deadline"]["type"] == "object"
    assert props["deadline"]["properties"]["epoch_time"]["type"] == "integer"
    assert props["students"] == {"type": "array", "items": {"type": "string"}}


def test_schema_unsupported_returns_none(spark, store, cids):
    assert infer_schema_json(spark, store, cids["text"], "text/plain") is None


def test_schema_cache_roundtrip(spark, store, catalog, cids):
    # miss → infer → write-back → hit (metadata.clj:55-65 flow)
    assert catalog.get_schema(cids["csv"]) is None
    s1 = cached_schema(spark, store, catalog, cids["csv"], "text/csv")
    assert s1 is not None
    assert catalog.get_schema(cids["csv"]) == s1
    s2 = cached_schema(spark, store, catalog, cids["csv"], "text/csv")
    assert s2 == s1


def test_bulk_add_datasets(catalog, cids):
    base = {"file": cids["csv"], "source": "bulk", "topics": ["t"]}
    ids = catalog.add_datasets([{**base, "description": f"bulk-{i}", "seq": str(i)} for i in range(25)])
    assert len(ids) == 25 and ids == sorted(ids)
    found = catalog.find(["==", [".", ["$"], "source"], "bulk"])
    assert found.count() == 25
    import pytest as _pytest

    from comlake_core_spark.catalog import MissingMetadata

    with _pytest.raises(MissingMetadata):
        catalog.add_datasets([{**base, "description": "x"}, {"description": "incomplete"}])


def test_extract_parquet_content(spark, tmp_path):
    """Parquet MIME extension: native types survive, predicate applies."""
    import io

    import pandas as pd

    from comlake_core_spark.extract.reader import extract, read_content
    from comlake_core_spark.store import LocalStore

    pdf = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    buf = io.BytesIO()
    pdf.to_parquet(buf, index=False)
    buf.seek(0)
    store = LocalStore(str(tmp_path / "cas"))
    cid = store.add(buf)
    df = read_content(spark, store, cid, "application/vnd.apache.parquet")
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["bigint", "string"]
    out = extract(spark, store, cid, [">", [".", ["$"], "a"], 1], "application/x-parquet")
    assert sorted(r["b"] for r in out.collect()) == ["y", "z"]


def test_catalog_writer_mutex_cross_process(spark, tmp_path):
    """Two PROCESSES mutating one catalog root must serialize via the
    flock in _WriterMutex: every add lands, ids are distinct (no lost
    updates from racing snapshot-pointer flips)."""
    import subprocess
    import sys
    import textwrap

    from comlake_core_spark.catalog import Catalog

    root = str(tmp_path / "mpcat")
    cat = Catalog(spark, root)
    cat.upsert_content("QmMP", "text/plain")

    script = textwrap.dedent(
        """
        import sys
        sys.path.insert(0, "/root/repo")
        from comlake_core_spark.catalog import Catalog
        from comlake_core_spark.session import get_spark
        spark = get_spark("mutex-worker-" + sys.argv[2], shuffle_partitions=2)
        cat = Catalog(spark, sys.argv[1])
        ids = [cat.add_dataset({"file": "QmMP", "description": f"p{sys.argv[2]}-{i}",
                                "source": "mp", "topics": []}) for i in range(3)]
        print(",".join(map(str, ids)))
        """
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, root, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        for i in range(2)
    ]
    all_ids = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0
        all_ids += [int(x) for x in out.strip().splitlines()[-1].split(",")]
    assert len(all_ids) == 6
    assert len(set(all_ids)) == 6, f"lost update: duplicate ids {sorted(all_ids)}"
    final = {r["description"] for r in cat.dataset().collect()}
    assert final == {f"p{w}-{i}" for w in range(2) for i in range(3)}


def test_writer_mutex_flock_failure_closes_fd_and_warns(tmp_path, monkeypatch):
    """ADVICE r3: when flock raises OSError the opened fd must be closed
    (no leak per failed acquire) and a one-time RuntimeWarning must flag the
    degraded cross-process protection."""
    import warnings

    import fcntl as real_fcntl

    from comlake_core_spark.catalog.catalog import _WriterMutex

    def boom(*a, **k):
        raise OSError("flock not supported")

    monkeypatch.setattr(real_fcntl, "flock", boom)
    monkeypatch.setattr(_WriterMutex, "_warned_no_flock", False)
    m = _WriterMutex(str(tmp_path))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        with m:
            assert m._fd is None  # fd closed, not leaked half-open
        with m:  # second acquire: no duplicate warning
            pass
    runtime = [w for w in caught if issubclass(w.category, RuntimeWarning)]
    assert len(runtime) == 1
    assert "degraded" in str(runtime[0].message)


def test_cas_commit_conflict_detected_and_retried(spark, tmp_path, monkeypatch):
    """VERDICT r3 #7: two Catalog instances over ONE shared root (the
    two-primaries shape), with flock disabled so the CAS token is the only
    serialization.  A commit racing in between another writer's read and
    write must raise CommitConflict on the direct path, and the retrying
    mutation path must land both updates with no lost update."""
    import fcntl

    from comlake_core_spark.catalog.catalog import Catalog

    monkeypatch.setattr(fcntl, "flock", lambda *a, **k: None)
    a = Catalog(spark, str(tmp_path))
    b = Catalog(spark, str(tmp_path))

    a.add_dataset({"file": "f", "description": "base", "source": "s", "topics": []})
    # direct CAS check: A reads v0, B commits v1, A's write must conflict
    ver, _ = a._current_pointer("dataset")
    df_a = a.dataset()
    b.add_dataset({"file": "f", "description": "from-b", "source": "s", "topics": []})
    with pytest.raises(Catalog.CommitConflict):
        a._write("dataset", df_a, a.dataset().schema, expected_version=ver)
    # ...and the losing writer's orphan dir was cleaned up: every committed
    # version resolves, and no uncommitted dataset-v* dirs accumulate refs
    # the retry path: both writers' mutations land (ids distinct, all rows)
    id_a = a.add_dataset({"file": "f", "description": "retry-a", "source": "s", "topics": []})
    assert id_a is not None
    rows = {r["description"] for r in a.dataset().collect()}
    assert rows == {"base", "from-b", "retry-a"}
    # versions are strictly serialized: one token per commit, no gaps
    assert a.snapshot_versions("dataset") == [0, 1, 2]


def test_cas_two_writer_threads_no_lost_update(spark, tmp_path, monkeypatch):
    """Two writer instances hammered concurrently (flock no-op, separate
    in-process locks — CAS is the only cross-writer serialization): every
    add lands exactly once, ids are unique, version history is dense."""
    import fcntl
    from concurrent.futures import ThreadPoolExecutor

    from comlake_core_spark.catalog.catalog import Catalog

    monkeypatch.setattr(fcntl, "flock", lambda *a, **k: None)
    writers = [Catalog(spark, str(tmp_path)) for _ in range(2)]
    n_each = 4

    def work(i):
        cat = writers[i % 2]
        return cat.add_dataset(
            {"file": "f", "description": f"w{i}", "source": "s", "topics": []}
        )

    with ThreadPoolExecutor(max_workers=4) as pool:
        ids = list(pool.map(work, range(2 * n_each)))
    assert len(set(ids)) == 2 * n_each, f"duplicate ids: {sorted(ids)}"
    got = {r["description"] for r in writers[0].dataset().collect()}
    assert got == {f"w{i}" for i in range(2 * n_each)}, "lost update detected"
    versions = writers[0].snapshot_versions("dataset")
    assert versions == list(range(2 * n_each)), f"non-serialized history: {versions}"


def test_snapshot_versions_sees_legacy_pre_cas_dirs(spark, tmp_path):
    """ADVICE r4 catalog.py:278: a catalog created before the CAS commit
    protocol has token-less `{table}-vN` dirs and a `{table}.current`
    single-pointer file.  snapshot_versions must enumerate those (deduped
    against token versions) so history, vacuum and dataset_as_of error
    messages stay correct after the first CAS commit on a legacy root."""
    import shutil

    import os

    from comlake_core_spark.catalog.catalog import Catalog

    cat = Catalog(spark, str(tmp_path))
    cat.add_dataset({"file": "f", "description": "v0", "source": "s", "topics": []})
    cat.add_dataset({"file": "f", "description": "v1", "source": "s", "topics": []})
    # rewrite the catalog into the PRE-CAS layout: plain `dataset-vN` dirs
    # + a single `dataset.current` pointer, no tokens
    versions = cat.snapshot_versions("dataset")
    assert versions == [0, 1]
    for v in versions:
        src = cat._version_dir("dataset", v)
        legacy_dir = str(tmp_path / f"dataset-v{v}")
        shutil.copytree(src, legacy_dir)
    for name in list(os.listdir(tmp_path)):
        if name.startswith("dataset.current.v") or (
            name.startswith("dataset-v") and "-p" in name
        ):
            p = tmp_path / name
            shutil.rmtree(p) if p.is_dir() else p.unlink()
    with open(tmp_path / "dataset.current", "w") as f:
        f.write(str(tmp_path / "dataset-v1"))

    legacy = Catalog(spark, str(tmp_path))
    # history visible without any token files
    assert legacy.snapshot_versions("dataset") == [0, 1]
    assert {r["description"] for r in legacy.dataset_as_of(0).collect()} == {"v0"}
    # first CAS commit on the legacy root must not make pre-migration
    # versions disappear from the listing
    legacy.add_dataset({"file": "f", "description": "v2", "source": "s", "topics": []})
    assert legacy.snapshot_versions("dataset") == [0, 1, 2]
    # ...and vacuum now actually cleans the legacy dirs
    doomed = legacy.vacuum(keep_last=1, table="dataset")
    assert doomed == [0, 1]
    assert not (tmp_path / "dataset-v0").exists()
    assert not (tmp_path / "dataset-v1").exists()
    assert {r["description"] for r in legacy.dataset().collect()} == {"v0", "v1", "v2"}


def test_current_pointer_survives_racing_vacuum_unlink(spark, tmp_path, monkeypatch):
    """ADVICE r4 catalog.py:182: another process's vacuum() can unlink a
    token between our os.listdir and open.  Simulate the stale listing with
    a phantom token name on the FIRST listdir; the reader must re-scan and
    return the real newest snapshot instead of raising FileNotFoundError."""
    import os as _os

    from comlake_core_spark.catalog.catalog import Catalog

    cat = Catalog(spark, str(tmp_path))
    cat.add_dataset({"file": "f", "description": "v0", "source": "s", "topics": []})

    real_listdir = _os.listdir
    calls = {"n": 0}

    def stale_once(path):
        out = list(real_listdir(path))
        if _os.path.abspath(str(path)) == _os.path.abspath(str(tmp_path)):
            calls["n"] += 1
            if calls["n"] == 1:
                out.append("dataset.current.v99")  # unlinked-by-vacuum ghost
        return out

    monkeypatch.setattr(_os, "listdir", stale_once)
    version, vdir = cat._current_pointer("dataset")
    assert version == 0 and vdir is not None
    assert calls["n"] >= 2, "reader did not re-scan after the ghost token"


def test_cas_commit_falls_back_when_hardlinks_unsupported(spark, tmp_path, monkeypatch):
    """ADVICE r4 catalog.py:240: on filesystems without hard links (the
    same mounts where flock degrades), os.link raises a generic OSError —
    the commit must fall back to an O_CREAT|O_EXCL token write instead of
    hard-failing every mutation, and the fallback must still lose cleanly
    when the token already exists."""
    import errno
    import os as _os

    from comlake_core_spark.catalog.catalog import Catalog

    def no_links(src, dst, **kw):
        raise OSError(errno.EPERM, "Operation not permitted (no hardlink support)")

    monkeypatch.setattr(_os, "link", no_links)
    cat = Catalog(spark, str(tmp_path))
    cat.add_dataset({"file": "f", "description": "a", "source": "s", "topics": []})
    cat.add_dataset({"file": "f", "description": "b", "source": "s", "topics": []})
    assert cat.snapshot_versions("dataset") == [0, 1]
    assert {r["description"] for r in cat.dataset().collect()} == {"a", "b"}
    # conflict path under the fallback: pre-existing token → CommitConflict,
    # loser's orphan dir cleaned up
    ver, _ = cat._current_pointer("dataset")
    df = cat.dataset()
    schema = df.schema
    with open(cat._token("dataset", ver + 1), "w") as f:
        f.write("someone-else")
    with pytest.raises(Catalog.CommitConflict):
        cat._write("dataset", df, schema, expected_version=ver)
