"""Transactional-catalog seam (VERDICT r8 #8): the Catalog's storage
contract is exactly two overridables — `_current_pointer` (newest
committed snapshot) and `_write` (publish version N+1 with put-if-absent
semantics).  This swaps in a Delta-style commit protocol (a `_log/`
directory of zero-padded JSON entries, one per version, O_EXCL-created —
the put-if-absent file that IS Delta's commit) and runs the catalog
battery through it unchanged, proving the documented
interface-compatible swap (catalog.py module docstring, SCALING.md
"Known local-mode artifacts")."""

from __future__ import annotations

import json
import os
import threading

import pytest

from comlake_core_spark.catalog import Catalog, MissingMetadata


class DeltaLogCatalog(Catalog):
    """Catalog with a Delta-style `_log/` commit protocol: version N is
    committed iff `_log/{N:020d}.json` exists; the entry names the
    parquet version dir.  Exclusive-create on the log entry is the CAS —
    exactly Delta's log-entry put-if-absent, replacing the base class's
    token-link scheme.  Everything above `_write`/`_current_pointer`
    (optimistic retry, find, revisions, snapshot time travel) is
    inherited untouched: that inheritance is the seam under test."""

    def _log_dir(self, table: str) -> str:
        d = os.path.join(self.root, f"{table}._log")
        os.makedirs(d, exist_ok=True)
        return d

    def snapshot_versions(self, table: str = "dataset"):
        d = self._log_dir(table)
        return sorted(int(e[:-5]) for e in os.listdir(d) if e.endswith(".json"))

    def _version_dir(self, table: str, version: int):
        entry = os.path.join(self._log_dir(table), f"{version:020d}.json")
        if os.path.exists(entry):
            with open(entry) as f:
                return json.load(f)["version_dir"]
        return None

    def _current_pointer(self, table: str):
        d = self._log_dir(table)
        entries = sorted(e for e in os.listdir(d) if e.endswith(".json"))
        if not entries:
            return -1, None
        with open(os.path.join(d, entries[-1])) as f:
            return int(entries[-1][:-5]), json.load(f)["version_dir"]

    def _write(self, table, df, schema, expected_version=None):
        current_version, _dir = self._current_pointer(table)
        if expected_version is not None and current_version != expected_version:
            raise Catalog.CommitConflict(
                f"{table}: read v{expected_version}, now v{current_version}"
            )
        new_version = current_version + 1
        self._commit_seq += 1
        version_dir = os.path.join(
            self.root, f"{table}-delta-v{new_version}-c{self._commit_seq}-t{threading.get_ident() & 0xFFFF}"
        )
        df.select(*[f.name for f in schema.fields]).write.mode("overwrite").parquet(version_dir)
        entry = os.path.join(self._log_dir(table), f"{new_version:020d}.json")
        try:
            fd = os.open(entry, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            import shutil

            shutil.rmtree(version_dir, ignore_errors=True)
            raise Catalog.CommitConflict(f"{table}: lost the race to v{new_version}") from None
        with os.fdopen(fd, "w") as f:
            json.dump({"version_dir": version_dir}, f)


@pytest.fixture()
def cat(spark, tmp_path):
    return DeltaLogCatalog(spark, str(tmp_path / "delta-cat"))


def test_catalog_battery_through_delta_log_protocol(cat):
    cat.upsert_content("cid-1", "text/csv")
    cat.upsert_content("cid-2", "text/plain")
    cat.upsert_content("cid-1", "application/json")  # upsert replaces
    assert cat.get_type("cid-1") == "application/json"

    d1 = cat.add_dataset(
        {"file": "cid-1", "description": "a", "source": "s", "topics": ["t"], "k": "v"}
    )
    d2 = cat.add_dataset(
        {"file": "cid-2", "description": "b", "source": "s", "topics": []}
    )
    assert d2 == d1 + 1
    with pytest.raises(MissingMetadata):
        cat.add_dataset({"file": "cid-1"})

    # copy-on-write revision through the inherited path
    d3 = cat.update_dataset(d1, {"description": "a2"})
    assert d3 is not None and cat.update_dataset(99999, {}) is None

    rows = cat.find(["==", [".", ["$"], "description"], "a2"]).collect()
    assert [r["id"] for r in rows] == [d3]
    assert rows[0]["parent"] == d1 and rows[0]["extra"]["k"] == "v"

    # the log IS the version history
    assert cat._current_pointer("dataset")[0] == 2  # add, add, update
    assert cat._current_pointer("content")[0] == 2


def test_concurrent_writers_serialize_through_log_cas(cat):
    cat.upsert_content("cid-x", "text/plain")
    ids, errs = [], []

    def add(i):
        try:
            ids.append(
                cat.add_dataset(
                    {"file": "cid-x", "description": f"d{i}", "source": "s", "topics": []}
                )
            )
        except Exception as e:  # pragma: no cover - failure diagnostics
            errs.append(e)

    threads = [threading.Thread(target=add, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs and sorted(ids) == list(range(min(ids), min(ids) + 6))
    assert cat.dataset().count() == 6


def test_time_travel_reads_old_log_versions(cat):
    cat.upsert_content("cid-y", "text/plain")
    a = cat.add_dataset({"file": "cid-y", "description": "v1", "source": "s", "topics": []})
    cat.update_dataset(a, {"description": "v2"})
    versions = cat.snapshot_versions("dataset")
    assert len(versions) >= 2
    first = cat.dataset_as_of(versions[0])
    assert first.count() == 1 and first.first()["description"] == "v1"
