"""Spark-free catalog snapshot-pointer resolution.

The catalog's commit protocol (catalog.py: token files ``{table}.current.vN``
published with an atomic put-if-absent link) is plain POSIX — readers need
no Spark.  This module holds the reader side so Spark-free processes (the
serving tier's read workers, the DuckDB /find fallback) can resolve the
current committed snapshot of a catalog table with one readdir.
"""

from __future__ import annotations

import os
import re


def current_pointer(root: str, table: str) -> tuple[int, str | None]:
    """(version, version_dir) of the newest committed snapshot of `table`
    under catalog root `root`; (-1, None) for an empty catalog.

    Identical semantics to Catalog._current_pointer (which delegates here):
    take max(N) over token files, tolerate a concurrent vacuum unlinking
    the token between the scan and the read by re-scanning — the newest
    token always survives vacuum, so this terminates."""
    pat = re.compile(rf"^{re.escape(table)}\.current\.v(\d+)$")
    for _attempt in range(8):
        best = -1
        for name in os.listdir(root):
            m = pat.match(name)
            if m:
                best = max(best, int(m.group(1)))
        if best < 0:
            break
        try:
            with open(os.path.join(root, f"{table}.current.v{best}")) as f:
                return best, f.read().strip()
        except FileNotFoundError:
            continue
    # legacy single-pointer layout (pre-CAS catalogs)
    legacy = os.path.join(root, f"{table}.current")
    if os.path.exists(legacy):
        with open(legacy) as f:
            version_dir = f.read().strip()
        return int(os.path.basename(version_dir).split("-v")[-1]), version_dir
    return -1, None
