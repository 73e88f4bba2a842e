"""Spark read/write connector for the content store — the BASELINE.json
north star ("Spark read/write connectors for IPFS storage") as a first-class
PySpark 4 Python Data Source.

Usage:

    from comlake_core_spark.sources import register
    register(spark)
    df = (spark.read.format("comlake")
          .option("store_root", "/path/to/cas")
          .option("cid", dir_or_file_cid)
          .option("mime", "text/csv")
          .load())
    (df.write.format("comlake")
       .option("store_root", "/path/to/cas")
       .mode("append").save())   # content-addresses each row's bytes

Read side:
- a DIRECTORY CID fans out to one InputPartition per child (executors fetch
  their own blobs — the driver never touches content bytes);
- a FILE CID is a single partition (CSV rows parse executor-side);
- mime text/csv parses with extract-time semantics (header row, all values
  strings — reference extract/data.clj:23-27); mime application/json parses
  an array of objects; binary yields (name, cid, content).
- EqualTo filters on CSV string columns are accepted via pushFilters and
  applied during parsing — rows drop before they reach the engine.

Write side: each input row's ``content`` binary is stored (content-
addressed, deduped); the commit message carries the CIDs so the driver can
register them in a catalog.

Scale notes: per-child partitioning matches IPFS's natural sharding (a
dataset = a directory of part files, exactly how Spark writes parquet);
a single multi-GB CSV blob should be re-chunked at ingest (dir of parts)
rather than range-split, because content addressing works at blob
granularity. The store handle is reconstructed per-executor from options —
no driver state is shipped.
"""

from __future__ import annotations

import csv
import io
import json
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import BinaryType, StringType, StructField, StructType


def _open_store(options):
    from comlake_core_spark.store.local import LocalStore

    root = options.get("store_root")
    if root:
        return LocalStore(root)
    api = options.get("ipfs_api")
    if api:
        from comlake_core_spark.store.ipfs import IpfsStore

        return IpfsStore(api_base=api, gateway_base=options.get("ipfs_gateway", "http://127.0.0.1:8080"))
    raise ValueError("comlake source needs store_root or ipfs_api")


@dataclass
class _BlobPartition(InputPartition):
    name: str
    cid: str


class ComlakeReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.schema = schema
        self.options = options
        self.mime = options.get("mime", "text/csv")
        self.eq_filters: dict[str, str] = {}

    def pushFilters(self, filters):
        # accept EqualTo on string columns for CSV — applied at parse time;
        # everything else is returned for Spark to evaluate
        for f in filters:
            if self.mime == "text/csv" and isinstance(f, EqualTo) and isinstance(f.value, str) and len(f.attribute) == 1:
                self.eq_filters[f.attribute[0]] = f.value
            else:
                yield f

    def partitions(self):
        store = _open_store(self.options)
        cid = self.options["cid"]
        entries = store.ls(cid)
        if entries is None:  # single blob
            return [_BlobPartition(name=cid, cid=cid)]
        return [_BlobPartition(name=name, cid=child) for name, child in sorted(entries.items())]

    def read(self, partition):
        store = _open_store(self.options)
        with store.fetch(partition.cid) as f:
            data = f.read()
        names = [fld.name for fld in self.schema.fields]
        if self.mime == "text/csv":
            rows = csv.reader(io.StringIO(data.decode("utf-8")))
            header = next(rows, None)
            if header is None:
                return
            idx = {col: header.index(col) for col in names if col in header}
            fidx = {header.index(c): v for c, v in self.eq_filters.items() if c in header}
            for rec in rows:
                if any(rec[i] != v for i, v in fidx.items()):
                    continue
                yield tuple(rec[idx[c]] if c in idx else None for c in names)
        elif self.mime == "application/json":
            for obj in json.loads(data.decode("utf-8")):
                yield tuple(_plain(obj.get(c)) for c in names)
        else:  # binary passthrough
            yield (partition.name, partition.cid, data)


def _plain(v):
    if isinstance(v, (dict, list)):
        return json.dumps(v)
    return v


@dataclass
class _AddedBlobs(WriterCommitMessage):
    cids: list


class ComlakeWriter(DataSourceWriter):
    def __init__(self, options):
        self.options = options

    def write(self, iterator):
        store = _open_store(self.options)
        cids = []
        for row in iterator:
            content = row["content"]
            cids.append(store.add_bytes(bytes(content) if content is not None else b""))
        return _AddedBlobs(cids=cids)

    def commit(self, messages):
        # content-addressed writes are idempotent; nothing to finalize.
        # The CIDs are surfaced for catalog registration by the caller.
        all_cids = [c for m in messages if m is not None for c in m.cids]
        root = self.options.get("store_root")
        if root:
            import os

            with open(os.path.join(root, "_last_write_cids.json"), "w") as f:
                json.dump(sorted(all_cids), f)

    def abort(self, messages):
        pass  # CAS objects are harmless orphans; a GC pass can sweep them


class ComlakeDataSource(DataSource):
    @classmethod
    def name(cls):
        return "comlake"

    def schema(self):
        mime = self.options.get("mime", "text/csv")
        if mime == "text/csv":
            store = _open_store(self.options)
            cid = self.options["cid"]
            entries = store.ls(cid)
            first = cid if entries is None else sorted(entries.values())[0]
            with store.fetch(first) as f:
                header_line = f.read(1 << 16).decode("utf-8").splitlines()[0]
            cols = next(csv.reader([header_line]))
            # extract-time semantics: every CSV value is a string
            return StructType([StructField(c, StringType()) for c in cols])
        if mime == "application/json":
            store = _open_store(self.options)
            cid = self.options["cid"]
            entries = store.ls(cid)
            first = cid if entries is None else sorted(entries.values())[0]
            with store.fetch(first) as f:
                doc = json.load(f)
            keys = sorted({k for obj in doc[:20] for k in obj})
            return StructType([StructField(k, StringType()) for k in keys])
        return StructType(
            [
                StructField("name", StringType()),
                StructField("cid", StringType()),
                StructField("content", BinaryType()),
            ]
        )

    def reader(self, schema):
        return ComlakeReader(schema, self.options)

    def writer(self, schema, overwrite):
        return ComlakeWriter(self.options)


def register(spark) -> None:
    import os

    import comlake_core_spark

    # The DataSource class is cloudpickled into Python worker processes,
    # which import this module by name — the package must be on the
    # workers' PYTHONPATH even when the driver found it via sys.path.
    # Workers fork from a daemon that inherits the driver's environment,
    # so setting it here (before the first python-worker spawn) suffices
    # in local mode; on a cluster, ship the package via --py-files.
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(comlake_core_spark.__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = pkg_parent + (os.pathsep + existing if existing else "")

    # pushFilters support requires the opt-in conf (session-settable)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ComlakeDataSource)
    spark.dataSource.register(ComlakeCatalogStream)


# ---------------------------------------------------------------------------
# streaming: the catalog's snapshot versions ARE a changelog
# ---------------------------------------------------------------------------


class CatalogStreamReader(SimpleDataSourceStreamReader):
    """Stream of newly ingested content rows (cid, type).

    The catalog writes an immutable snapshot per mutation and flips a
    version pointer (catalog/catalog.py) — so the version number is a
    ready-made exactly-once streaming offset: micro-batch N..M = the cids
    present in snapshot M but not in snapshot N. Offsets are replayable
    because old snapshot dirs are retained.

    Scale: this reads catalog *metadata* (≪ data); the downstream plan —
    join the stream with content reads, run inference, index — is where
    executors do the work."""

    def __init__(self, options):
        self.root = options["catalog_root"]

    def _current_version(self) -> int:
        import os
        import re

        pat = re.compile(r"^content\.current\.v(\d+)$")
        best = -1
        for name in os.listdir(self.root):
            m = pat.match(name)
            if m:
                best = max(best, int(m.group(1)))
        if best >= 0:
            return best
        ptr = os.path.join(self.root, "content.current")  # legacy layout
        if not os.path.exists(ptr):
            return -1
        with open(ptr) as f:
            return int(os.path.basename(f.read().strip()).split("-v")[-1])

    def _version_dir(self, version: int) -> str:
        import os

        token = os.path.join(self.root, f"content.current.v{version}")
        if os.path.exists(token):
            with open(token) as f:
                return f.read().strip()
        return os.path.join(self.root, f"content-v{version}")  # legacy layout

    def _cids_at(self, version: int) -> dict:
        if version < 0:
            return {}
        import glob

        import pyarrow.parquet as pq

        out = {}
        for part in glob.glob(f"{self._version_dir(version)}/*.parquet"):
            table = pq.read_table(part, columns=["cid", "type"])
            for cid, typ in zip(table["cid"].to_pylist(), table["type"].to_pylist()):
                out[cid] = typ
        return out

    def initialOffset(self) -> dict:
        return {"version": -1}

    def read(self, start: dict):
        end_version = self._current_version()
        rows = self.readBetweenOffsets(start, {"version": end_version})
        return rows, {"version": end_version}

    def readBetweenOffsets(self, start: dict, end: dict):
        before = self._cids_at(start["version"])
        after = self._cids_at(end["version"])
        return iter(sorted((cid, typ) for cid, typ in after.items() if cid not in before))

    def commit(self, end: dict) -> None:
        pass  # snapshots are retained; offsets stay replayable


class ComlakeCatalogStream(DataSource):
    @classmethod
    def name(cls):
        return "comlake_catalog_stream"

    def schema(self):
        return StructType([StructField("cid", StringType()), StructField("type", StringType())])

    def simpleStreamReader(self, schema):
        return CatalogStreamReader(self.options)
