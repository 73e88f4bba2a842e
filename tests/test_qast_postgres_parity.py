"""Row-level qast parity against the reference's ACTUAL SQL backend.

The reference executes find-predicates by rendering qast to a PostgreSQL
WHERE string (reference src/comlake/core/qast.clj:24-65, `qast->psql` /
`ops-psql`) and letting PostgreSQL evaluate it.  The sandbox ships a real
PostgreSQL 15, so this suite closes the dialect loop the DuckDB fuzz
cannot: it ports the reference renderer verbatim-in-semantics (thin
string joins, same operator table), runs the rendered predicate in a
live PostgreSQL over the same 200 document rows, and asserts the
selected doc_id set equals the Spark compiler's — the engine's
production path — for every predicate in the golden set.

Scope notes (what parity CAN mean here):
- `~` is tested in find mode: PG's `~` is a partial match, same as the
  reference's find path (its extract path re-matches — full — which our
  regex_mode='full' mirrors; both are covered by the qast oracle rows).
- `/` is excluded: the reference's two backends disagree with each
  other (PG `/` truncates integers; the Clojure closure yields exact
  rationals), so no engine can match both — our documented choice
  (double division) is pinned by the DuckDB oracle family instead.
- comparison chains are tested binary: the reference renderer joins
  ``a > b > c`` textually, which PostgreSQL rejects (boolean > int) —
  the chain form is reference-dead in SQL, and our Kleene-chain choice
  is pinned by the qast oracle rows.

The cluster runs as `nobody` on a private unix socket under /tmp (no
TCP, no root), initdb'd per test session and destroyed after.  Skipped
cleanly when the postgres binaries are absent.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import uuid

import pytest

PG_BIN = "/usr/lib/postgresql/15/bin"
RUNUSER = shutil.which("runuser")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(f"{PG_BIN}/initdb") and RUNUSER),
    reason="postgres binaries not available in this sandbox",
)

SF_DIR = "/root/testdata/sf0.001"
N_ROWS = 200


# ---------------------------------------------------------------------------
# reference renderer, ported from qast.clj:24-65 (getter-psql / ops-psql /
# qast->psql).  Faithful to its semantics: thin string joins, `(...)`
# wrapping per node, MOD for %, `~` for regex, ARRAY[...] literal fallback
# for unknown-head vectors, bare string interpolation for literals (the
# documented injection hole — inputs here are trusted test constants).
# ---------------------------------------------------------------------------

_OPS_JOIN = {
    "+": " + ", "-": " - ", "*": " * ", "/": " / ",
    "==": " = ", "!=": " <> ", ">": " > ", ">=": " >= ",
    "<": " < ", "<=": " <= ", "&": " AND ", "|": " OR ",
}


def _getter_psql(coll: list[str]) -> str:
    # qast.clj getter-psql: "()" head folds the quoted field name in
    if coll and coll[0] == "()":
        name = coll[1]
        if name.startswith("'") and name.endswith("'"):
            name = name[1:-1]
        return _getter_psql([name] + coll[2:])
    return "->".join(coll)


def _ref_psql(ast) -> str:
    if isinstance(ast, list):
        head = ast[0] if ast else None
        args = [_ref_psql(a) for a in ast[1:]]
        if head == "$":
            return "()"
        if head == ".":
            return f"({_getter_psql(args)})"
        if head == "~":
            return f"({args[0]} ~ {args[1]})"
        if head == "%":
            return f"(MOD({args[0]}, {args[1]}))"
        if head == "!":
            return f"(NOT {args[0]})"
        if head == "&&":
            return f"({args[0]} && {args[1]})"
        if head in _OPS_JOIN:
            return f"({_OPS_JOIN[head].join(args)})"
        # unknown head: the vector is an ARRAY literal (qast.clj:58-60)
        return f"ARRAY[{', '.join(_ref_psql(a) for a in ast)}]"
    if isinstance(ast, str):
        return f"'{ast}'"
    return json.dumps(ast)


# ---------------------------------------------------------------------------
# live-cluster fixture
# ---------------------------------------------------------------------------


def _run(cmd: list[str], **kw) -> subprocess.CompletedProcess:
    return subprocess.run(
        [RUNUSER, "-u", "nobody", "--", *cmd],
        capture_output=True, text=True, timeout=120, cwd="/tmp", **kw,
    )


@pytest.fixture(scope="module")
def pg():
    base = f"/tmp/pg_qast_{uuid.uuid4().hex[:8]}"
    data = f"{base}/data"
    os.makedirs(base, exist_ok=True)
    shutil.chown(base, user="nobody")
    try:
        r = _run([f"{PG_BIN}/initdb", "-D", data, "-U", "pg", "--no-sync", "-A", "trust"])
        assert r.returncode == 0, r.stderr
        r = _run([
            f"{PG_BIN}/pg_ctl", "-D", data, "-l", f"{base}/log",
            "-o", f"-k {base} -p 55432 -c listen_addresses=''", "start",
        ])
        assert r.returncode == 0, r.stderr

        def q(sql: str) -> list[str]:
            r = _run([
                f"{PG_BIN}/psql", "-h", base, "-p", "55432", "-U", "pg",
                "-d", "postgres", "-At", "-c", sql,
            ])
            assert r.returncode == 0, f"{sql!r}: {r.stderr}"
            return [ln for ln in r.stdout.splitlines() if ln != ""]

        yield q
        _run([f"{PG_BIN}/pg_ctl", "-D", data, "stop", "-m", "immediate"])
    finally:
        shutil.rmtree(base, ignore_errors=True)


@pytest.fixture(scope="module")
def corpus(spark, pg):
    """The same 200 rows loaded into BOTH engines."""
    from comlake_core_spark.session import tables

    docs = tables(spark, SF_DIR, ["documents"])["documents"]
    rows = [
        (r["doc_id"], r["lang"], r["source"], r["n_chars"])
        for r in docs.select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id").limit(N_ROWS).collect()
    ]
    pg("CREATE TABLE documents (doc_id bigint, lang text, source text, n_chars bigint)")
    values = ", ".join(f"({d}, '{la}', '{s}', {n})" for d, la, s, n in rows)
    pg(f"INSERT INTO documents VALUES {values}")
    sdf = spark.createDataFrame(rows, "doc_id long, lang string, source string, n_chars long")
    return sdf


F_ = lambda name: [".", ["$"], name]  # noqa: E731

GOLDEN = [
    ["==", F_("lang"), "en"],
    ["!=", F_("lang"), "en"],
    [">", F_("n_chars"), 500],
    ["<=", F_("n_chars"), 300],
    ["&", [">", F_("n_chars"), 200], ["<", F_("n_chars"), 900], ["==", F_("lang"), "en"]],
    ["|", ["==", F_("lang"), "fr"], ["==", F_("source"), "web"]],
    ["!", ["==", F_("lang"), "en"]],
    ["==", ["%", F_("n_chars"), 7], 3],
    [">", ["+", F_("n_chars"), 100], 400],
    [">", ["*", F_("n_chars"), 2], ["-", 700, F_("n_chars")]],
    ["~", F_("lang"), "en|fr"],          # find-mode partial, like PG ~
    ["~", F_("source"), "^src1"],        # partial: src1, src1x, ...
    ["&", ["~", F_("lang"), "^(de|es)$"], [">=", F_("n_chars"), 100]],
    ["&&", ["en", "fr"], ["fr", "de"]],  # constant array overlap
]


@pytest.mark.parametrize("idx", range(len(GOLDEN)))
def test_spark_rows_equal_reference_postgres_rows(spark, pg, corpus, idx):
    from comlake_core_spark.qast.compiler import compile_predicate

    ast = GOLDEN[idx]
    where = _ref_psql(ast)
    pg_ids = sorted(int(x) for x in pg(
        f"SELECT doc_id FROM documents WHERE {where} ORDER BY doc_id"
    ))
    spark_ids = sorted(
        r["doc_id"]
        for r in corpus.filter(
            compile_predicate(ast, schema=corpus.schema, regex_mode="find")
        ).select("doc_id").collect()
    )
    assert spark_ids == pg_ids, f"ast={ast} where={where}"
    # every golden predicate must actually discriminate: non-trivial on
    # at least one side unless it is the constant-overlap row
    if idx != len(GOLDEN) - 1:
        assert 0 < len(pg_ids) < N_ROWS, f"degenerate predicate: {ast}"
