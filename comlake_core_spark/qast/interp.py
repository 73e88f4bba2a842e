"""Pure-Python qast interpreter with the reference closure-backend semantics
(reference src/comlake/core/qast.clj:90-129).

Two surfaces:

- ``compile_eval(ast, regex_mode) -> Callable[[row], value]`` — stages the
  AST walk ONCE (the reference's closure backend is literally this design:
  qast.clj compiles the query to a nested closure, then maps it over rows).
  The serving layer's /find snapshot path compiles per REQUEST and runs the
  closure per row, so the hot loop does no AST dispatch, no regex re-parse,
  no arity checks.
- ``eval_qast(ast, row, regex_mode)`` — one-shot convenience wrapper
  (compile + run), used by tests and single-row callers.

This is NOT a Spark execution path — the engine always executes through
the Spark compiler. It exists as the independent second implementation for
divergence testing: the reference caught regressions by running the same
queries through both of its backends (thesis/main/eval.tex:199-205); here,
property-based tests (tests/test_qast_property.py) compare the Spark
compiler against this interpreter on randomized ASTs — and as the
Spark-free evaluator behind the /find snapshot fast path (server.py,
serving.py).

Semantics pinned to match the compiler's documented choices:
- null propagation for arithmetic/comparison/regex/concat (not-nil-fn,
  qast.clj:75-80);
- & | ! Clojure truthiness with nil→false (qast.clj:114-118);
- % = sign of dividend (Clojure rem, qast.clj:106);
- / = double division (documented divergence from Clojure rationals);
- ~ full or partial regex per mode (qast.clj:97-101 vs :35); a malformed
  pattern is a QastError at COMPILE time, exactly like the Spark
  compiler's eager validation (ADVICE r2 #4);
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
from typing import Any, Callable

from comlake_core_spark.qast.compiler import QastError, compile_regex_quiet

# [a&&b]-class patterns are VALID input on the regex paths (Java set
# intersection the dialect layer handles); Python's re only raises the
# advisory "Possible nested set / set intersection / ..." FutureWarning
# family about them.  All advisory-prone compiles go through the shared
# compile_regex_quiet (qast/compiler.py): a module lock + catch_warnings
# scoped to the cold closure-build path — no process-global filter
# mutation (the r12 import-time filter was stripped by pytest's
# per-test filter resets; ADVICE r11/r12).


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


RowFn = Callable[[dict], Any]


#: (minimum, exact) operand counts, mirroring the compiler's _check_arity
#: calls — checked at COMPILE time (once per request), so the hot loop
#: stays arity-check-free.  Without these, a wrong-arity AST the compiler
#: 400s would silently evaluate here (e.g. ["%", a, b, c] dropped its
#: third operand), splitting the snapshot path from the Spark path.
_ARITY: dict[str, tuple[int, int | None]] = {
    "$": (0, 0),
    ".": (2, None),
    "~": (2, 2),
    "+": (1, None),
    "-": (1, None),
    "*": (1, None),
    "/": (1, None),
    "%": (2, 2),
    "==": (2, None),
    "!=": (2, None),
    ">": (2, None),
    ">=": (2, None),
    "<": (2, None),
    "<=": (2, None),
    "&&": (2, 2),
    "&": (1, None),
    "|": (1, None),
    "!": (1, 1),
}


def compile_eval(ast: Any, regex_mode: str = "full") -> RowFn:
    """Stage the AST into a row→value closure (compile once, run per row)."""

    def comp(node: Any) -> RowFn:
        if not isinstance(node, list):
            return lambda row: node
        if not node:
            raise QastError("empty array is not a valid expression")
        head = node[0]
        if not isinstance(head, str) or head not in _COMPILERS:
            elems = [comp(e) for e in node]
            return lambda row: [e(row) for e in elems]
        minimum, exact = _ARITY[head]
        args = node[1:]
        if exact is not None and len(args) != exact:
            raise QastError(f"operator {head!r} expects exactly {exact} operands, got {len(args)}")
        if len(args) < minimum:
            raise QastError(f"operator {head!r} expects at least {minimum} operands, got {len(args)}")
        return _COMPILERS[head](args, comp, regex_mode)

    return comp(ast)


def eval_qast(ast: Any, row: dict | None = None, regex_mode: str = "full") -> Any:
    return compile_eval(ast, regex_mode)(row or {})


def _c_root(args, comp, mode) -> RowFn:
    return lambda row: row


def _c_field(args, comp, mode) -> RowFn:
    base, keys = args[0], args[1:]
    from_root = isinstance(base, list) and base == ["$"]
    if from_root and len(keys) == 1:
        key = keys[0]  # the serving hot path: one dict lookup per row
        return lambda row: row.get(key) if isinstance(row, dict) else None
    base_fn = (lambda row: row) if from_root else comp(base)

    def field(row):
        cur = base_fn(row)
        for key in keys:
            if cur is None:
                return None
            cur = cur.get(key) if isinstance(cur, dict) else None
        return cur

    return field


def _c_regex(args, comp, mode) -> RowFn:
    from comlake_core_spark.qast.regex_dialect import to_python_re, translate_posix_classes

    if not isinstance(args[1], str):
        raise QastError("~ pattern must be a string literal")  # compiler parity
    # Java-semantics re-spelling: '.'-excludes-all-terminators, partial
    # trailing-$ forgives one final terminator, silently-divergent
    # constructs ([a&&b], (?i), \Z …) have no spelling — the serving
    # gates pre-screen those to the Spark path, so falling back to the
    # translated original here only affects direct interp callers (the
    # fuzz suites, which generate convergent patterns).  re.ASCII pins
    # \w \d \s \b to Java's default ASCII classes.
    pinned = to_python_re(args[1], mode)
    try:
        # the "Possible nested set"-family FutureWarning is suppressed
        # per-call by compile_regex_quiet's lock + catch_warnings —
        # thread-safe on ThreadingHTTPServer request threads AND immune
        # to later global-filter resets (ADVICE r11/r12; VERDICT r10 #8
        # introduced the suppression)
        rx = compile_regex_quiet(
            translate_posix_classes(args[1]) if pinned is None else pinned,
            re.ASCII,
        )
    except re.error as exc:
        # malformed pattern (e.g. "(") must surface as a 400 "malformed
        # query" on the serving path, not kill the keep-alive connection
        # (ADVICE r2 #4); eager validation = the compiler's behavior
        raise QastError(f"malformed regex pattern: {exc}") from exc
    sub = comp(args[0])
    matcher = rx.fullmatch if mode == "full" else rx.search

    def regex(row):
        s = sub(row)
        return None if s is None else bool(matcher(s))

    return regex


def _c_add(args, comp, mode) -> RowFn:
    subs = [comp(a) for a in args]

    def add(row):
        vals = [s(row) for s in subs]
        if _num_guard(vals):
            return None
        if all(isinstance(v, str) for v in vals):
            return "".join(vals)
        if all(isinstance(v, list) for v in vals):
            return reduce(lambda a, b: a + b, vals)
        return sum(vals)

    return add


def _c_sub(args, comp, mode) -> RowFn:
    subs = [comp(a) for a in args]

    def sub_(row):
        vals = [_coerce_num(s(row)) for s in subs]
        if _num_guard(vals):
            return None
        if len(vals) == 1:
            return -vals[0]
        return reduce(lambda a, b: a - b, vals)

    return sub_


def _c_mul(args, comp, mode) -> RowFn:
    subs = [comp(a) for a in args]

    def mul(row):
        vals = [_coerce_num(s(row)) for s in subs]
        return None if _num_guard(vals) else reduce(lambda a, b: a * b, vals)

    return mul


def _c_div(args, comp, mode) -> RowFn:
    subs = [comp(a) for a in args]

    def div(row):
        vals = [_coerce_num(s(row)) for s in subs]
        if _num_guard(vals):
            return None
        if len(vals) == 1:
            vals = [1.0, vals[0]]
        try:
            return reduce(lambda a, b: float(a) / float(b), vals)
        except ZeroDivisionError:
            return None  # compiler uses try_divide: division by zero → NULL

    return div


def _c_mod(args, comp, mode) -> RowFn:
    sa, sb = comp(args[0]), comp(args[1])

    def mod(row):
        a, b = _coerce_num(sa(row)), _coerce_num(sb(row))
        if a is None or b is None or b == 0:
            return None  # compiler uses try_mod: remainder by zero → NULL
        if (isinstance(a, float) and not math.isfinite(a)) or (
            isinstance(b, float) and math.isnan(b)
        ):
            return math.nan  # try_mod: ±inf dividend or NaN operand → NaN
        r = math.fmod(a, b)  # sign of dividend, like Clojure rem / Spark %
        return int(r) if isinstance(a, int) and isinstance(b, int) else r

    return mod


def _cmp_pair(x, y, cmp):
    # mixed str/number pair: the compiler try_casts the UNKNOWN (string)
    # side to double — mirror it dynamically
    if isinstance(x, str) and _is_number(y):
        x = spark_str_to_double(x)
    elif isinstance(y, str) and _is_number(x):
        y = spark_str_to_double(y)
    if x is None or y is None:
        return None
    # Spark's comparison ordering for NaN: equal to itself, greater than
    # every other double (docs "NaN semantics"); Python's IEEE NaN would
    # answer False to everything.  Reachable here via a coerced "nan"
    # extras value or a NaN double column.
    if (isinstance(x, float) and math.isnan(x)) or (isinstance(y, float) and math.isnan(y)):
        xk = (1,) if isinstance(x, float) and math.isnan(x) else (0, x)
        yk = (1,) if isinstance(y, float) and math.isnan(y) else (0, y)
        return cmp(xk, yk)
    return cmp(x, y)


def _c_chain(cmp, negate: bool = False):
    """Comparison chain with Kleene three-valued AND.

    Deliberate, documented divergence from the reference's not-nil-fn
    (qast.clj:75-80, which returns nil whenever ANY operand is nil): the
    Spark compiler emits AND-reduced pairwise comparisons, and SQL AND is
    false-dominant — (0==1) & (1==nil) is FALSE, not nil. Through the
    reference's only predicate surface (filters) the two are
    indistinguishable (false and nil both drop the row), and keeping the
    plain AND chain preserves parquet filter pushdown, so the engine pins
    Kleene semantics and this interpreter models that pin.

    ``negate`` implements ``!=`` (Clojure not= is "not all equal",
    qast.clj:108): null stays null, True/False flip.
    """

    def compile_(args, comp, mode) -> RowFn:
        subs = [comp(a) for a in args]

        def chain(row):
            vals = [s(row) for s in subs]
            pairs = [_cmp_pair(x, y, cmp) for x, y in zip(vals, vals[1:])]
            if any(p is False for p in pairs):
                result = False
            elif any(p is None for p in pairs):
                return None
            else:
                result = True
            return (not result) if negate else result

        return chain

    return compile_


def _c_overlap(args, comp, mode) -> RowFn:
    sa, sb = comp(args[0]), comp(args[1])

    def overlap(row):
        a, b = sa(row), sb(row)
        if a is None or b is None:
            return None
        return bool(set(a) & set(b))

    return overlap


def _c_and(args, comp, mode) -> RowFn:
    subs = [comp(a) for a in args]
    return lambda row: all(_truthy(s(row)) for s in subs)


def _c_or(args, comp, mode) -> RowFn:
    subs = [comp(a) for a in args]
    return lambda row: any(_truthy(s(row)) for s in subs)


def _c_not(args, comp, mode) -> RowFn:
    sub = comp(args[0])
    return lambda row: not _truthy(sub(row))


_COMPILERS = {
    "$": _c_root,
    ".": _c_field,
    "~": _c_regex,
    "+": _c_add,
    "-": _c_sub,
    "*": _c_mul,
    "/": _c_div,
    "%": _c_mod,
    "==": _c_chain(lambda x, y: x == y),
    "!=": _c_chain(lambda x, y: x == y, negate=True),
    ">": _c_chain(lambda x, y: x > y),
    ">=": _c_chain(lambda x, y: x >= y),
    "<": _c_chain(lambda x, y: x < y),
    "<=": _c_chain(lambda x, y: x <= y),
    "&&": _c_overlap,
    "&": _c_and,
    "|": _c_or,
    "!": _c_not,
}
