"""Pure-Python qast interpreter with the reference closure-backend semantics
(reference src/comlake/core/qast.clj:90-129).

This is NOT a runtime execution path — the engine always executes through
the Spark compiler. It exists as the independent second implementation for
divergence testing: the reference caught regressions by running the same
queries through both of its backends (thesis/main/eval.tex:199-205); here,
property-based tests (tests/test_qast_property.py) compare the Spark
compiler against this interpreter on randomized ASTs.

Semantics pinned to match the compiler's documented choices:
- null propagation for arithmetic/comparison/regex/concat (not-nil-fn,
  qast.clj:75-80);
- & | ! Clojure truthiness with nil→false (qast.clj:114-118);
- % = sign of dividend (Clojure rem, qast.clj:106);
- / = double division (documented divergence from Clojure rationals);
- ~ full or partial regex per mode (qast.clj:97-101 vs :35);
- unknown head → array literal (qast.clj:56,61-62);
- dynamic string operands in numeric contexts take Spark's try_cast
  double coercion (spark_str_to_double below), and NaN compares with
  Spark's ordering (equal to itself, greater than everything) — the
  regime that lets the /find snapshot path serve dynamic-extras
  predicates (server.snapshot_safe).
"""

from __future__ import annotations

import math
import re
from functools import reduce
from typing import Any

from comlake_core_spark.qast.compiler import QastError


def _truthy(v: Any) -> bool:
    return v is not None and v is not False


def _num_guard(args):
    return any(a is None for a in args)


# --- Spark string→double coercion parity ---------------------------------
# The compiler coerces UNKNOWN-kind operands (dynamic extras fields, which
# are strings at runtime) with try_cast(double) in numeric contexts; the
# interpreter mirrors that coercion DYNAMICALLY (a str operand where a
# number is needed).  Parity corners pinned against Spark 4's try_cast
# (tests/test_qast_property.py extras fuzz): trim of chars <= 0x20 only,
# Java Double.parseDouble grammar incl. fFdD suffix and 0x..p.. hex
# floats, bare case-insensitive 'nan' (signed nan → NULL), signed
# inf/infinity, overflow → ±inf, NO underscores/commas/unicode digits.

_TRIM = "".join(chr(c) for c in range(0x21))
_DEC_RE = re.compile(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?")
_HEX_RE = re.compile(r"[+-]?0[xX]([0-9a-fA-F]+\.?[0-9a-fA-F]*|\.[0-9a-fA-F]+)[pP][+-]?\d+")


def spark_str_to_double(s: str) -> float | None:
    """``CAST(s AS DOUBLE)`` with try semantics, bit-matching Spark."""
    t = s.strip(_TRIM)
    if not t:
        return None
    low = t.lower()
    if low == "nan":
        return math.nan
    body, sign = (low[1:], -1.0 if low[0] == "-" else 1.0) if low[:1] in ("+", "-") else (low, 1.0)
    if body in ("inf", "infinity"):
        return sign * math.inf
    if t[-1] in "dDfF" and len(t) > 1:
        t = t[:-1]
    try:
        if _HEX_RE.fullmatch(t):
            return float.fromhex(t)
        if _DEC_RE.fullmatch(t):
            return float(t)  # Python overflows to ±inf here, like Java
    except (ValueError, OverflowError):
        return None
    return None


def _is_number(v: Any) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def _coerce_num(v: Any) -> Any:
    """Arithmetic-context operand: strings take the Spark double cast."""
    return spark_str_to_double(v) if isinstance(v, str) else v


def eval_qast(ast: Any, row: dict | None = None, regex_mode: str = "full") -> Any:
    row = row or {}

    def ev(node: Any) -> Any:
        if not isinstance(node, list):
            return node
        if not node:
            raise QastError("empty array is not a valid expression")
        head = node[0]
        if not isinstance(head, str) or head not in _OPS:
            return [ev(e) for e in node]
        return _OPS[head](node[1:], ev, row, regex_mode)

    return ev(ast)


def _field(args, ev, row, mode):
    base = args[0]
    if isinstance(base, list) and base == ["$"]:
        cur: Any = row
    else:
        cur = ev(base)
    for key in args[1:]:
        if cur is None:
            return None
        cur = cur.get(key) if isinstance(cur, dict) else None
    return cur


def _regex(args, ev, row, mode):
    from comlake_core_spark.qast.regex_dialect import translate_posix_classes

    if not isinstance(args[1], str):
        raise QastError("~ pattern must be a string literal")  # compiler parity
    s, p = ev(args[0]), translate_posix_classes(args[1])
    if s is None:
        return None
    try:
        return bool(re.fullmatch(p, s)) if mode == "full" else bool(re.search(p, s))
    except re.error as exc:
        # malformed pattern (e.g. "(") must surface as a 400 "malformed
        # query" on the serving path, not kill the keep-alive connection
        # (ADVICE r2 #4); the compiler path rejects it eagerly the same way
        raise QastError(f"malformed regex pattern: {exc}") from exc


def _add(args, ev, row, mode):
    vals = [ev(a) for a in args]
    if _num_guard(vals):
        return None
    if all(isinstance(v, str) for v in vals):
        return "".join(vals)
    if all(isinstance(v, list) for v in vals):
        return reduce(lambda a, b: a + b, vals)
    return sum(vals)


def _sub(args, ev, row, mode):
    vals = [_coerce_num(ev(a)) for a in args]
    if _num_guard(vals):
        return None
    if len(vals) == 1:
        return -vals[0]
    return reduce(lambda a, b: a - b, vals)


def _mul(args, ev, row, mode):
    vals = [_coerce_num(ev(a)) for a in args]
    return None if _num_guard(vals) else reduce(lambda a, b: a * b, vals)


def _div(args, ev, row, mode):
    vals = [_coerce_num(ev(a)) for a in args]
    if _num_guard(vals):
        return None
    if len(vals) == 1:
        vals = [1.0, vals[0]]
    try:
        return reduce(lambda a, b: float(a) / float(b), vals)
    except ZeroDivisionError:
        return None  # compiler uses try_divide: division by zero → NULL


def _mod(args, ev, row, mode):
    a, b = _coerce_num(ev(args[0])), _coerce_num(ev(args[1]))
    if a is None or b is None or b == 0:
        return None  # compiler uses try_mod: remainder by zero → NULL
    if (isinstance(a, float) and not math.isfinite(a)) or (
        isinstance(b, float) and math.isnan(b)
    ):
        return math.nan  # try_mod: ±inf dividend or NaN operand → NaN
    r = math.fmod(a, b)  # sign of dividend, like Clojure rem / Spark %
    return int(r) if isinstance(a, int) and isinstance(b, int) else r


def _chain(cmp):
    """Comparison chain with Kleene three-valued AND.

    Deliberate, documented divergence from the reference's not-nil-fn
    (qast.clj:75-80, which returns nil whenever ANY operand is nil): the
    Spark compiler emits AND-reduced pairwise comparisons, and SQL AND is
    false-dominant — (0==1) & (1==nil) is FALSE, not nil. Through the
    reference's only predicate surface (filters) the two are
    indistinguishable (false and nil both drop the row), and keeping the
    plain AND chain preserves parquet filter pushdown, so the engine pins
    Kleene semantics and this interpreter models that pin.
    """

    def pair(x, y):
        # mixed str/number pair: the compiler try_casts the UNKNOWN
        # (string) side to double — mirror it dynamically
        if isinstance(x, str) and _is_number(y):
            x = spark_str_to_double(x)
        elif isinstance(y, str) and _is_number(x):
            y = spark_str_to_double(y)
        if x is None or y is None:
            return None
        # Spark's comparison ordering for NaN: equal to itself, greater
        # than every other double (docs "NaN semantics"); Python's IEEE
        # NaN would answer False to everything.  Reachable here via a
        # coerced "nan" extras value or a NaN double column.
        if (isinstance(x, float) and math.isnan(x)) or (isinstance(y, float) and math.isnan(y)):
            xk = (1,) if isinstance(x, float) and math.isnan(x) else (0, x)
            yk = (1,) if isinstance(y, float) and math.isnan(y) else (0, y)
            return cmp(xk, yk)
        return cmp(x, y)

    def impl(args, ev, row, mode):
        vals = [ev(a) for a in args]
        pairs = [pair(x, y) for x, y in zip(vals, vals[1:])]
        if any(p is False for p in pairs):
            return False
        if any(p is None for p in pairs):
            return None
        return True

    return impl


def _ne(args, ev, row, mode):
    eq = _chain(lambda x, y: x == y)(args, ev, row, mode)
    return None if eq is None else not eq


def _overlap(args, ev, row, mode):
    a, b = ev(args[0]), ev(args[1])
    if a is None or b is None:
        return None
    return bool(set(a) & set(b))


def _and(args, ev, row, mode):
    return all(_truthy(ev(a)) for a in args)


def _or(args, ev, row, mode):
    return any(_truthy(ev(a)) for a in args)


def _not(args, ev, row, mode):
    return not _truthy(ev(args[0]))


_OPS = {
    "$": lambda args, ev, row, mode: row,
    ".": _field,
    "~": _regex,
    "+": _add,
    "-": _sub,
    "*": _mul,
    "/": _div,
    "%": _mod,
    "==": _chain(lambda x, y: x == y),
    "!=": _ne,
    ">": _chain(lambda x, y: x > y),
    ">=": _chain(lambda x, y: x >= y),
    "<": _chain(lambda x, y: x < y),
    "<=": _chain(lambda x, y: x <= y),
    "&&": _overlap,
    "&": _and,
    "|": _or,
    "!": _not,
}
