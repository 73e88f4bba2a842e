"""qast → ANSI SQL renderer (DuckDB dialect).

The reference compiled qast to a PostgreSQL WHERE string as its production
SQL backend (reference src/comlake/core/qast.clj:52-65). This engine
executes ONLY through the Spark compiler (qast/compiler.py); this renderer
exists as the third independent implementation for divergence testing —
tests/test_qast_duckdb_fuzz.py runs randomized ASTs through the Spark
compiler, the Python interpreter (qast/interp.py) AND DuckDB, the
sqllogictest-style cross-engine strategy. Three implementations can't
share a bug by copy-paste.

Semantics are pinned to the compiler's documented choices (see
qast/compiler.py's module docstring): Kleene AND comparison chains
rendered as pairwise AND; `&`/`|`/`!` through the same truthiness
lattice (nil→false, 0/"" truthy); `/` as double division; `%` keeping
the dividend's sign (DuckDB's `%` already does); `+` dispatching to
`||` for all-string / all-array operands (SQL `||` null-propagates
exactly like Spark concat); `~` as regexp_full_match / regexp_matches
per regex mode.

Dialect notes (why this targets DuckDB, not every engine):
- list literals render as [a, b, ...] and `&&` as list_has_any();
- nested field paths into string columns render as
  json_extract_string(col, '$.path') mirroring the compiler's
  get_json_object;
- division by zero: DuckDB raises where Spark yields NULL, so `/`
  renders with a NULLIF(divisor, 0) guard to pin the compiler's
  null-on-zero semantics.
"""

from __future__ import annotations

from functools import reduce
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


def qast_to_sql(
    ast: Any, kinds: dict[str, str] | None = None, regex_mode: str = "full"
) -> str:
    """Render a qast expression as a SQL expression string.

    `kinds` maps top-level field names to 'bool'|'num'|'str'|'arr' — the
    same type knowledge default_resolver extracts from a Spark schema;
    unknown/missing fields render as NULL (the reference's row-map `get`
    returns nil for absent keys, qast.clj:93-96)."""
    s = _render(ast, kinds or {}, regex_mode)
    if isinstance(s, _Root):
        raise QastError('bare ["$"] is not a complete expression')
    return s.sql


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


def _render(ast: Any, kinds: dict[str, str], mode: str) -> _S | _Root:
    if not isinstance(ast, list):
        return _lit(ast)
    if not ast:
        raise QastError("empty array is not a valid expression")
    head = ast[0]
    if not isinstance(head, str) or head not in _OPS:
        elems = [_render(e, kinds, mode) for e in ast]
        if any(isinstance(e, _Root) for e in elems):
            raise QastError('["$"] cannot appear inside an array literal')
        return _S("[" + ", ".join(e.sql for e in elems) + "]", _ARR)
    return _OPS[head](ast[1:], kinds, mode)


def _args(args: list[Any], kinds: dict[str, str], mode: str) -> list[_S]:
    out = []
    for a in args:
        s = _render(a, kinds, mode)
        if isinstance(s, _Root):
            raise QastError('["$"] is only valid as the first operand of "."')
        out.append(s)
    return out


def _op_root(args, kinds, mode):
    if args:
        raise QastError('operator "$" expects exactly 0 operands')
    return _ROOT


def _op_field(args, kinds, mode):
    if len(args) < 2:
        raise QastError('operator "." expects at least 2 operands')
    base = _render(args[0], kinds, mode)
    path = args[1:]
    if not all(isinstance(p, str) for p in path):
        raise QastError("field path components must be strings")
    if isinstance(base, _Root):
        head, *rest = path
        if head not in kinds:
            return _S("NULL", _UNKNOWN)
        if not rest:
            return _S(_quote_ident(head), kinds[head])
        if kinds[head] == _STR:
            jpath = "$." + ".".join(rest)
            return _S(
                f"json_extract_string({_quote_ident(head)}, {_quote_str(jpath)})",
                _UNKNOWN,
            )
        raise QastError("sqlgen supports nested paths only into string (JSON) columns")
    raise QastError("sqlgen supports field access only from the row root")


def _op_regex(args, kinds, mode):
    if len(args) != 2 or not isinstance(args[1], str):
        raise QastError("~ expects (expr, string-literal pattern)")
    (s,) = _args(args[:1], kinds, mode)
    fn = "regexp_full_match" if mode == "full" else "regexp_matches"
    return _S(f"{fn}({s.sql}, {_quote_str(args[1])})", _BOOL)


def _fold(op: str, parts: list[str]) -> str:
    return "(" + f" {op} ".join(parts) + ")"


def _op_add(args, kinds, mode):
    ts = _args(args, kinds, mode)
    if not ts:
        raise QastError('operator "+" expects at least 1 operand')
    kset = {t.kind for t in ts}
    if kset == {_STR} or kset == {_ARR}:
        return _S(_fold("||", [t.sql for t in ts]), ts[0].kind)
    return _S(_fold("+", [t.sql for t in ts]), _NUM)


def _op_sub(args, kinds, mode):
    ts = _args(args, kinds, mode)
    if not ts:
        raise QastError('operator "-" expects at least 1 operand')
    if len(ts) == 1:
        return _S(f"(- {ts[0].sql})", _NUM)
    return _S(_fold("-", [t.sql for t in ts]), _NUM)


def _op_mul(args, kinds, mode):
    ts = _args(args, kinds, mode)
    if not ts:
        raise QastError('operator "*" expects at least 1 operand')
    return _S(_fold("*", [t.sql for t in ts]), _NUM)


def _op_div(args, kinds, mode):
    ts = _args(args, kinds, mode)
    if not ts:
        raise QastError('operator "/" expects at least 1 operand')
    if len(ts) == 1:
        ts = [_S("1.0", _NUM), ts[0]]
    # NULLIF pins Spark's null-on-divide-by-zero (DuckDB would raise)
    sql = f"CAST({ts[0].sql} AS DOUBLE)"
    for t in ts[1:]:
        sql = f"({sql} / NULLIF(CAST({t.sql} AS DOUBLE), 0.0))"
    return _S(sql, _NUM)


def _op_mod(args, kinds, mode):
    if len(args) != 2:
        raise QastError('operator "%" expects exactly 2 operands')
    a, b = _args(args, kinds, mode)
    return _S(f"({a.sql} % NULLIF({b.sql}, 0))", _NUM)


def _chain(op: str):
    def impl(args, kinds, mode):
        if len(args) < 2:
            raise QastError(f"operator {op!r} expects at least 2 operands")
        ts = _args(args, kinds, mode)
        pairs = [f"({a.sql} {op} {b.sql})" for a, b in zip(ts, ts[1:])]
        return _S(_fold("AND", pairs) if len(pairs) > 1 else pairs[0], _BOOL)

    return impl


def _op_ne(args, kinds, mode):
    eq = _chain("=")(args, kinds, mode)
    return _S(f"(NOT {eq.sql})", _BOOL)


def _op_overlap(args, kinds, mode):
    if len(args) != 2:
        raise QastError('operator "&&" expects exactly 2 operands')
    a, b = _args(args, kinds, mode)
    return _S(f"list_has_any({a.sql}, {b.sql})", _BOOL)


def _logical(op: str):
    def impl(args, kinds, mode):
        ts = _args(args, kinds, mode)
        if not ts:
            raise QastError(f"operator expects at least 1 operand")
        return _S(_fold(op, [_truthy(t) for t in ts]), _BOOL)

    return impl


def _op_not(args, kinds, mode):
    if len(args) != 1:
        raise QastError('operator "!" expects exactly 1 operand')
    (t,) = _args(args, kinds, mode)
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
