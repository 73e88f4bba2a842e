"""Bench methodology pins as tests, not conventions (VERDICT r11 #7).

The r11 round caught Catalyst's ColumnPruning rewriting an Aggregate
under ``count()`` down to its grouping keys and ELIMINATING the
row-preserving left joins under audit — a count()-forced timing measured
0.53 s where the noop sink measures 3.1-3.8 s (SCALING.md r11).  The
rule: every timing harness forces the noop sink, and SCALING.md carries
the pin.  These tests make the rule load-bearing.
"""

from __future__ import annotations

import os
import re

_REPO = os.path.dirname(os.path.dirname(__file__))

# every committed timing harness: (path, function that owns the timed action)
_HARNESSES = [
    "bench.py",
    "scripts/scale_curve.py",
    "scripts/sf1_validate.py",
]


def _src(relpath: str) -> str:
    with open(os.path.join(_REPO, relpath)) as f:
        return f.read()


def test_scaling_md_carries_the_pin():
    text = _src("SCALING.md")
    assert "count() is not a benchmark action" in text, (
        "SCALING.md lost the r11 methodology pin paragraph"
    )
    assert ".write.format(\"noop\")" in text or "``.write.format(\"noop\")``" in text


def test_harnesses_force_noop_sink():
    for path in _HARNESSES:
        src = _src(path)
        assert 'format("noop")' in src, f"{path}: timed action must be the noop sink"


def test_harnesses_never_time_a_count_action():
    """`.count()` as the timed action is what the pin forbids.  Allow it
    only on lines that are comments (bench.py documents operators' own
    eager counts); a live `.count()` call in a timing harness is a
    regression to the pre-pin methodology."""
    offenders = []
    for path in _HARNESSES:
        for i, line in enumerate(_src(path).splitlines(), 1):
            code = line.split("#", 1)[0]
            if re.search(r"\.count\(\)", code):
                offenders.append(f"{path}:{i}: {line.strip()}")
    assert not offenders, (
        "timing harnesses must force the noop sink, not count() "
        f"(SCALING.md r11 pin): {offenders}"
    )


def test_scaling_md_new_timing_claims_do_not_cite_count():
    """Prose guard: a SCALING.md sentence that *claims a measurement was
    taken via count()* re-opens the pruning hole.  The pin paragraph
    itself (and the KN/containment post-mortems that QUOTE count()
    numbers to document the artifact) are the only allowed mentions —
    they all live before the 'Rule recorded' sentence or name the pin.
    Any OTHER 'measured ... count()' / 'count() measured' phrasing is an
    offender."""
    text = _src("SCALING.md")
    pin_at = text.find("count() is not a benchmark action")
    assert pin_at >= 0
    tail = text[pin_at:]
    # the pin block runs to the end of its paragraph (blank line, or EOF
    # when the pin is the file's final paragraph)
    blank = tail.find("\n\n")
    pin_block_end = len(text) if blank == -1 else pin_at + blank
    offenders = []
    for m in re.finditer(r"(?:measured[^.\n]{0,60}count\(\)|count\(\)[^.\n]{0,60}measur)", text):
        if not (pin_at <= m.start() <= pin_block_end):
            offenders.append(text[max(0, m.start() - 40): m.end() + 20])
    assert not offenders, f"count()-based timing claims outside the pin block: {offenders}"
