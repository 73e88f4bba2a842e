"""qast → ANSI SQL renderer (DuckDB dialect).

The reference compiled qast to a PostgreSQL WHERE string as its production
SQL backend (reference src/comlake/core/qast.clj:52-65). This engine
executes ONLY through the Spark compiler (qast/compiler.py); this renderer
exists (a) as the third independent implementation for divergence testing —
tests/test_qast_duckdb_fuzz.py runs randomized ASTs through the Spark
compiler, the Python interpreter (qast/interp.py) AND DuckDB, the
sqllogictest-style cross-engine strategy; three implementations can't
share a bug by copy-paste — and (b) as the serving layer's /find fallback
executor: predicates the driver-resident snapshot can't serve render here
and run in DuckDB over the catalog's parquet snapshot instead of paying a
Spark job per request (VERDICT r8 "Next round" #2; see findsql.py).

Semantics are pinned to the compiler's documented choices (see
qast/compiler.py's module docstring): Kleene AND comparison chains
rendered as pairwise AND; `&`/`|`/`!` through the same truthiness
lattice (nil→false, 0/"" truthy); `/` as double division; `%` keeping
the dividend's sign (DuckDB's `%` already does); `+` dispatching to
`||` for all-string / all-array operands (SQL `||` null-propagates
exactly like Spark concat); `~` as regexp_full_match / regexp_matches
per regex mode; UNKNOWN-kind operands (dynamic extras fields,
JSON-extracted values — strings at runtime) coerce into arithmetic and
numeric comparisons via TRY_CAST(x AS DOUBLE), mirroring the compiler's
``_num_view`` / ``_chain`` try_cast semantics exactly (malformed→NULL,
never an error).

Dialect notes (why this targets DuckDB, not every engine):
- list literals render as [a, b, ...] and `&&` as list_has_any();
- nested field paths into string columns render as
  json_extract_string(col, '$.path') mirroring the compiler's
  get_json_object;
- division by zero: DuckDB raises where Spark yields NULL, so `/`
  renders with a NULLIF(divisor, 0) guard to pin the compiler's
  null-on-zero semantics.

The optional ``dynamic`` hook maps a top-level field name that is NOT in
``kinds`` to a SQL expression (the /find fallback passes the merged
extras-map lookup); without it, unknown fields render as NULL (the
reference's row-map ``get`` returns nil for absent keys, qast.clj:93-96).
"""

from __future__ import annotations

from typing import Any, Callable

from comlake_core_spark.qast.compiler import QastError

_BOOL, _NUM, _STR, _ARR, _UNKNOWN = "bool", "num", "str", "arr", "unknown"


class _Root:
    __slots__ = ()


_ROOT = _Root()


class _S:
    __slots__ = ("sql", "kind")

    def __init__(self, sql: str, kind: str = _UNKNOWN):
        self.sql = sql
        self.kind = kind


class _Ctx:
    __slots__ = ("kinds", "mode", "dynamic")

    def __init__(self, kinds, mode, dynamic):
        self.kinds = kinds
        self.mode = mode
        self.dynamic = dynamic


def qast_to_sql(
    ast: Any,
    kinds: dict[str, str] | None = None,
    regex_mode: str = "full",
    dynamic: Callable[[str], str] | None = None,
) -> str:
    """Render a qast expression as a SQL expression string.

    `kinds` maps top-level field names to 'bool'|'num'|'str'|'arr' — the
    same type knowledge default_resolver extracts from a Spark schema.
    `dynamic`, when given, renders fields missing from `kinds` (they get
    kind UNKNOWN: string-or-null at runtime, like the compiler's extras
    resolution); otherwise unknown fields render as NULL."""
    s = _render(ast, _Ctx(kinds or {}, regex_mode, dynamic))
    if isinstance(s, _Root):
        raise QastError('bare ["$"] is not a complete expression')
    return s.sql


def qast_to_sql_predicate(
    ast: Any,
    kinds: dict[str, str] | None = None,
    regex_mode: str = "full",
    dynamic: Callable[[str], str] | None = None,
) -> str:
    """Render for use in a WHERE clause — the renderer's form of the
    compiler's ``compile_predicate``: a boolean-rooted expression passes
    through bare (SQL WHERE drops NULLs, matching Spark), any other root
    takes the truthiness wrapper, under which every non-null value —
    including 0 and '' — keeps the row.  Without this, DuckDB's implicit
    WHERE cast would drop rows whose arithmetic root evaluates to 0
    while the Spark and snapshot tiers keep them."""
    s = _render(ast, _Ctx(kinds or {}, regex_mode, dynamic))
    if isinstance(s, _Root):
        raise QastError('bare ["$"] is not a predicate')
    return s.sql if s.kind == _BOOL else _truthy(s)


def _quote_str(v: str) -> str:
    return "'" + v.replace("'", "''") + "'"


def _quote_ident(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def _lit(value: Any) -> _S:
    if isinstance(value, bool):
        return _S("TRUE" if value else "FALSE", _BOOL)
    if isinstance(value, (int, float)):
        return _S(repr(value), _NUM)
    if isinstance(value, str):
        return _S(_quote_str(value), _STR)
    if value is None:
        return _S("NULL", _UNKNOWN)
    if isinstance(value, dict):
        pairs = ", ".join(f"{_quote_str(k)}: {_lit(v).sql}" for k, v in value.items())
        return _S("{" + pairs + "}", _UNKNOWN)
    raise QastError(f"unsupported literal: {value!r}")


def _truthy(s: _S) -> str:
    if s.kind == _BOOL:
        return f"COALESCE({s.sql}, FALSE)"
    if s.kind in (_NUM, _STR, _ARR):
        return f"({s.sql} IS NOT NULL)"
    return (
        f"(({s.sql} IS NOT NULL) AND "
        f"COALESCE((CAST({s.sql} AS VARCHAR) != 'false'), TRUE))"
    )


def _num_view(t: _S) -> str:
    """Numeric view of an operand — the renderer's form of the compiler's
    ``_num_view`` (compiler.py:166): UNKNOWN-kind subexpressions coerce
    via TRY_CAST(double) with malformed→NULL; typed operands pass
    through."""
    return f"TRY_CAST({t.sql} AS DOUBLE)" if t.kind == _UNKNOWN else t.sql


def _render(ast: Any, ctx: _Ctx) -> _S | _Root:
    if not isinstance(ast, list):
        return _lit(ast)
    if not ast:
        raise QastError("empty array is not a valid expression")
    head = ast[0]
    if not isinstance(head, str) or head not in _OPS:
        elems = [_render(e, ctx) for e in ast]
        if any(isinstance(e, _Root) for e in elems):
            raise QastError('["$"] cannot appear inside an array literal')
        return _S("[" + ", ".join(e.sql for e in elems) + "]", _ARR)
    return _OPS[head](ast[1:], ctx)


def _args(args: list[Any], ctx: _Ctx) -> list[_S]:
    out = []
    for a in args:
        s = _render(a, ctx)
        if isinstance(s, _Root):
            raise QastError('["$"] is only valid as the first operand of "."')
        out.append(s)
    return out


def _op_root(args, ctx):
    if args:
        raise QastError('operator "$" expects exactly 0 operands')
    return _ROOT


def _op_field(args, ctx):
    if len(args) < 2:
        raise QastError('operator "." expects at least 2 operands')
    base = _render(args[0], ctx)
    path = args[1:]
    if not all(isinstance(p, str) for p in path):
        raise QastError("field path components must be strings")
    if isinstance(base, _Root):
        head, *rest = path
        if head not in ctx.kinds:
            if ctx.dynamic is None:
                return _S("NULL", _UNKNOWN)
            base_sql = ctx.dynamic(head)
            if not rest:
                return _S(base_sql, _UNKNOWN)
            return _S(_json_path(base_sql, rest), _UNKNOWN)
        if not rest:
            return _S(_quote_ident(head), ctx.kinds[head])
        if ctx.kinds[head] == _STR:
            return _S(_json_path(_quote_ident(head), rest), _UNKNOWN)
        raise QastError("sqlgen supports nested paths only into string (JSON) columns")
    raise QastError("sqlgen supports field access only from the row root")


def _json_path(base_sql: str, rest: list[str]) -> str:
    """Nested traversal into a JSON string, pinned to Spark's
    get_json_object: invalid JSON yields NULL (DuckDB's json_extract
    would raise), absent keys yield NULL, string/number/bool leaves
    render unquoted, object/array leaves render as JSON text."""
    jpath = _quote_str("$." + ".".join(rest))
    return (
        f"(CASE WHEN json_valid({base_sql}) "
        f"THEN json_extract_string({base_sql}, {jpath}) END)"
    )


def _op_regex(args, ctx):
    if len(args) != 2 or not isinstance(args[1], str):
        raise QastError("~ expects (expr, string-literal pattern)")
    (s,) = _args(args[:1], ctx)
    fn = "regexp_full_match" if ctx.mode == "full" else "regexp_matches"
    # re-spell the Java-compiled pattern in RE2 ('.'/'$'/POSIX-class
    # pinning); constructs with silently-divergent readings are refused —
    # the find tier's gate pre-screens them, this raise is the backstop
    # for direct callers (ADVICE r9 #1)
    from comlake_core_spark.qast.regex_dialect import to_re2

    re2 = to_re2(args[1], ctx.mode)
    if re2 is None:
        raise QastError("regex pattern has no RE2 spelling with Java semantics")
    return _S(f"{fn}({s.sql}, {_quote_str(re2)})", _BOOL)


def _fold(op: str, parts: list[str]) -> str:
    return "(" + f" {op} ".join(parts) + ")"


def _op_add(args, ctx):
    ts = _args(args, ctx)
    if not ts:
        raise QastError('operator "+" expects at least 1 operand')
    kset = {t.kind for t in ts}
    if kset == {_STR} or kset == {_ARR}:
        return _S(_fold("||", [t.sql for t in ts]), ts[0].kind)
    return _S(_fold("+", [_num_view(t) for t in ts]), _NUM)


def _op_sub(args, ctx):
    ts = _args(args, ctx)
    if not ts:
        raise QastError('operator "-" expects at least 1 operand')
    if len(ts) == 1:
        return _S(f"(- {_num_view(ts[0])})", _NUM)
    return _S(_fold("-", [_num_view(t) for t in ts]), _NUM)


def _op_mul(args, ctx):
    ts = _args(args, ctx)
    if not ts:
        raise QastError('operator "*" expects at least 1 operand')
    return _S(_fold("*", [_num_view(t) for t in ts]), _NUM)


def _op_div(args, ctx):
    ts = _args(args, ctx)
    if not ts:
        raise QastError('operator "/" expects at least 1 operand')
    if len(ts) == 1:
        ts = [_S("1.0", _NUM), ts[0]]
    # NULLIF pins Spark's null-on-divide-by-zero (DuckDB would raise);
    # UNKNOWN operands TRY_CAST first (malformed→NULL, like try_divide
    # over _num_view in the compiler)
    sql = f"CAST({_num_view(ts[0])} AS DOUBLE)"
    for t in ts[1:]:
        sql = f"({sql} / NULLIF(CAST({_num_view(t)} AS DOUBLE), 0.0))"
    return _S(sql, _NUM)


def _op_mod(args, ctx):
    if len(args) != 2:
        raise QastError('operator "%" expects exactly 2 operands')
    a, b = _args(args, ctx)
    return _S(f"({_num_view(a)} % NULLIF({_num_view(b)}, 0))", _NUM)


def _chain(op: str):
    def impl(args, ctx):
        if len(args) < 2:
            raise QastError(f"operator {op!r} expects at least 2 operands")
        ts = _args(args, ctx)

        def pair(a: _S, b: _S) -> str:
            # compiler._chain parity: an UNKNOWN side compared against a
            # known-numeric side takes the try_cast(double) coercion
            # (string→double, malformed→NULL→pair NULL); UNKNOWN-vs-string
            # and UNKNOWN-vs-UNKNOWN compare as strings (both are VARCHAR
            # at runtime here)
            sa, sb = a.sql, b.sql
            if a.kind == _UNKNOWN and b.kind == _NUM:
                sa = f"TRY_CAST({sa} AS DOUBLE)"
            elif b.kind == _UNKNOWN and a.kind == _NUM:
                sb = f"TRY_CAST({sb} AS DOUBLE)"
            return f"({sa} {op} {sb})"

        pairs = [pair(a, b) for a, b in zip(ts, ts[1:])]
        return _S(_fold("AND", pairs) if len(pairs) > 1 else pairs[0], _BOOL)

    return impl


def _op_ne(args, ctx):
    eq = _chain("=")(args, ctx)
    return _S(f"(NOT {eq.sql})", _BOOL)


def _op_overlap(args, ctx):
    if len(args) != 2:
        raise QastError('operator "&&" expects exactly 2 operands')
    a, b = _args(args, ctx)
    return _S(f"list_has_any({a.sql}, {b.sql})", _BOOL)


def _logical(op: str):
    def impl(args, ctx):
        ts = _args(args, ctx)
        if not ts:
            raise QastError(f"operator expects at least 1 operand")
        return _S(_fold(op, [_truthy(t) for t in ts]), _BOOL)

    return impl


def _op_not(args, ctx):
    if len(args) != 1:
        raise QastError('operator "!" expects exactly 1 operand')
    (t,) = _args(args, ctx)
    return _S(f"(NOT {_truthy(t)})", _BOOL)


_OPS: dict[str, Callable[..., _S | _Root]] = {
    "$": _op_root,
    ".": _op_field,
    "~": _op_regex,
    "+": _op_add,
    "-": _op_sub,
    "*": _op_mul,
    "/": _op_div,
    "%": _op_mod,
    "==": _chain("="),
    "!=": _op_ne,
    ">": _chain(">"),
    ">=": _chain(">="),
    "<": _chain("<"),
    "<=": _chain("<="),
    "&&": _op_overlap,
    "&": _logical("AND"),
    "|": _logical("OR"),
    "!": _op_not,
}
