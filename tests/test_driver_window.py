"""Driver-window curation contract (VERDICT r2 "Next round" #1).

The external driver verifies only the FIRST 50 entries of
``__spark_entry__.queries()`` per round.  These pins guarantee each round's
window is the curated rotation — a few driver-green sentinels + ≥40
never-driver-seen workloads — and that every window entry carries a full
value-hash oracle (so all 50 driver rows can go green, none rows-only).
"""

from __future__ import annotations

import json
import os

import __spark_entry__ as entry_mod
from comlake_core_spark.workloads import DRIVER_WINDOW, REGISTRY, ordered_names

# the window the driver verified in rounds 1-2 (original registration order;
# keys of CORRECTNESS_r01/r02)
R1_R2_WINDOW = [
    "qast_eq_filter", "qast_extract_regex", "qast_find_regex",
    "qast_arith_revenue", "qast_maths_composite", "qast_array_overlap",
    "extract_json_field", "catalog_find", "catalog_latest_revision",
    "agg_pricing_summary", "topk_orders", "topk_orders_per_segment",
    "join_revenue_by_nation", "distinct_event_users", "events_hourly",
    "window_running_sum", "part_brand_stats", "text_stats",
    "text_token_budget", "text_lang_id", "text_quality",
    "text_tfidf_top_terms", "text_top_bigrams", "bm25_search",
    "text_pmi_bigrams", "agg_grouping_sets", "dedup_exact",
    "dedup_ngram_jaccard", "dedup_clusters", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_embedding", "dedup_winnow", "ann_cosine_topk",
    "ann_ivf_topk", "hybrid_search_rrf", "ann_ivf_kmeans_topk",
    "events_sessionize", "semi_join_orders_shipped_late",
    "anti_join_customers_no_final", "agg_rollup_flag_status",
    "events_props_sum", "multimodal_bytes_meta", "multimodal_png_decode",
    "multimodal_decode_features", "layout_partition_pruned_read",
    "streaming_hourly_events", "array_higher_order", "events_props_variant",
    "qast_string_concat",
]


def test_window_is_50_known_workloads():
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    assert not missing, f"window names not in REGISTRY: {missing}"


def test_queries_leads_with_window_then_full_registry():
    qs = list(entry_mod.queries())
    assert qs[:50] == DRIVER_WINDOW
    assert sorted(qs) == sorted(REGISTRY), "ordered_names must expose every workload"
    assert qs == ordered_names()


def driver_seen() -> set[str]:
    """Every workload with a driver-green row in a PAST round: the r1-r2
    window plus the keys of committed CORRECTNESS_r*.json artifacts —
    excluding any artifact produced by the CURRENT window (its keyset
    equals DRIVER_WINDOW's).  Counting that one would evaluate the
    current window against results produced by that very window, so the
    assertion self-invalidated the moment the driver landed its file
    (VERDICT r4 "What's wrong" #4).  Keying the exclusion on the keyset
    rather than "the newest file" means a freshly-ROTATED window counts
    the previous round's artifact as the past evidence it is."""
    seen = set(R1_R2_WINDOW)
    repo = os.path.dirname(os.path.dirname(__file__))
    arts = sorted(
        f for f in os.listdir(repo)
        if f.startswith("CORRECTNESS_r") and f.endswith(".json")
    )
    for fname in arts[:-1]:  # every non-newest artifact is past evidence
        with open(os.path.join(repo, fname)) as f:
            seen |= set(json.load(f))
    if arts:
        with open(os.path.join(repo, arts[-1])) as f:
            keys = set(json.load(f))
        # The newest artifact is excluded when it came from the CURRENT
        # window — keyed on SUBSET, not equality, so a partial artifact
        # (driver crashed mid-run: 49 of 50 keys) still fails CLOSED
        # instead of silently self-evaluating (review r6 #5).  A rotated
        # window makes the previous round's keys a non-subset, so that
        # artifact counts as the past evidence it is.
        if not keys <= set(DRIVER_WINDOW):
            seen |= keys
    return seen


def test_window_rotation_carries_new_evidence():
    """Each rotation must expose fresh workloads to the driver: >=40
    first-timers while >=40 remain unseen; once fewer remain (the final
    rotation), the window must carry ALL of them instead."""
    seen = driver_seen()
    unseen = [n for n in REGISTRY if n not in seen]
    first_time = [n for n in DRIVER_WINDOW if n not in seen]
    if len(unseen) >= 40:
        assert len(first_time) >= 40, (
            f"only {len(first_time)} never-driver-seen workloads in the "
            "window; the rotation must carry >=40 (VERDICT r3 #1)"
        )
    else:
        left_out = [n for n in unseen if n not in DRIVER_WINDOW]
        assert not left_out, (
            f"final rotation must close the registry: never-driver-seen "
            f"workloads missing from the window: {left_out}"
        )


def test_every_window_entry_has_full_oracle():
    rows_only = [n for n in DRIVER_WINDOW if REGISTRY[n].oracle is None]
    assert not rows_only, f"window entries without a value-hash oracle: {rows_only}"


def test_oracle_sql_order_matches_queries():
    qs = list(entry_mod.queries())
    os_ = list(entry_mod.oracle_sql())
    assert os_ == [n for n in qs if REGISTRY[n].oracle is not None]


def test_registry_frozen_for_r6():
    """The r6 window carries ALL 38 never-driver-seen workloads, so a
    50/50-green CORRECTNESS_r06 closes the registry at cumulative
    222/222 driver-verified.  Registering workload #223 before that
    artifact lands would re-open the post-window debt that rotations
    r3-r6 spent four rounds paying down (VERDICT r5 "Next round" #1) —
    new operators built during r6 ship as code + pytest and register in
    r7.  Once CORRECTNESS_r06.json exists the freeze lifts."""
    repo = os.path.dirname(os.path.dirname(__file__))
    if os.path.exists(os.path.join(repo, "CORRECTNESS_r06.json")):
        return  # r6 evidence landed; the freeze is over
    assert len(REGISTRY) == 222, (
        f"registry grew to {len(REGISTRY)} during the r6 freeze; hold new "
        "workload registrations until CORRECTNESS_r06.json lands (r7)"
    )


def test_rotation_log_count_matches_registry():
    """The rotation-log comment in workloads.py must state the true
    post-window count (VERDICT r5 doc-nit: the log said '40' when
    222 registered − 184 driver-seen = 38).  Staleness-pin the figure
    the same way WORKLOADS.md and the HTTP table are pinned."""
    import inspect
    import comlake_core_spark.workloads as w

    src = inspect.getsource(w)
    true_count = len([n for n in REGISTRY if n not in driver_seen()])
    if true_count == 0:
        return  # registry closed: every workload driver-verified
    assert f"{true_count} never-driver-seen post-window" in src, (
        f"rotation log does not state the true post-window count "
        f"({true_count}); update the comment above DRIVER_WINDOW"
    )


# ---------------------------------------------------------------------------
# evidence freshness (VERDICT r8 "Next round" #6): with the registry closed
# at 239/239 cumulative, rotation switches from "never-driver-seen" to
# "stale" — engine code changed after the workload's last green row
# ---------------------------------------------------------------------------

import functools
import inspect
import re
import subprocess

_REPO = os.path.dirname(os.path.dirname(__file__))


@functools.lru_cache(maxsize=None)
def _git_time(relpath: str) -> int | None:
    """Unix time of the newest commit touching relpath; None if untracked
    or git is unavailable (the check degrades to skipped, never wrong)."""
    try:
        out = subprocess.run(
            ["git", "log", "-1", "--format=%ct", "--", relpath],
            cwd=_REPO, capture_output=True, text=True, timeout=30,
        ).stdout.strip()
    except (OSError, subprocess.SubprocessError):
        return None
    return int(out) if out else None


def _engine_files(name: str) -> set[str]:
    """Engine modules the workload's fn imports — operators/*, qast/*,
    streaming/*, catalog/*, server, ... — but NOT its workloads/*.py
    registration file (appended every round: counting it would mark the
    whole registry stale each rotation) nor session.py (config churn)."""
    src = inspect.getsource(REGISTRY[name].fn)
    files = set()
    for m in re.finditer(r"from (comlake_core_spark(?:\.\w+)+) import", src):
        mod = m.group(1)
        if mod.split(".")[1] in ("workloads", "session"):
            continue
        p = mod.replace(".", "/") + ".py"
        if os.path.exists(os.path.join(_REPO, p)):
            files.add(p)
        elif os.path.exists(os.path.join(_REPO, mod.replace(".", "/"), "__init__.py")):
            files.add(mod.replace(".", "/") + "/__init__.py")
    return files


def _green_times() -> dict[str, int]:
    """name -> commit time of the newest CORRECTNESS artifact holding a
    green (rows_match, no err) row for it."""
    greens: dict[str, int] = {}
    for fname in sorted(
        f for f in os.listdir(_REPO)
        if f.startswith("CORRECTNESS_r") and f.endswith(".json")
    ):
        t = _git_time(fname)
        if t is None:
            continue
        with open(os.path.join(_REPO, fname)) as f:
            data = json.load(f)
        for name, row in data.items():
            if isinstance(row, dict) and row.get("rows_match") and not row.get("err"):
                greens[name] = max(greens.get(name, 0), t)
    return greens


def stale_names() -> set[str]:
    """Workloads whose driver evidence is stale: never green, or an engine
    module changed after their newest green row."""
    greens = _green_times()
    out = set()
    for name in REGISTRY:
        gt = greens.get(name)
        if gt is None:
            out.add(name)
            continue
        for p in _engine_files(name):
            ft = _git_time(p)
            if ft is not None and ft > gt:
                out.add(name)
                break
    return out


def test_window_rotation_prioritizes_stale_evidence():
    """Once every workload is driver-seen, each rotation must spend its
    non-sentinel slots re-verifying STALE evidence: >=40 window slots
    stale while >=40 remain stale overall; once fewer remain, the window
    must carry all of them.  (Skipped while never-seen workloads exist —
    the first-timer rule above governs then — and self-excludes the
    current window's own artifact exactly like driver_seen.)"""
    if _git_time("__spark_entry__.py") is None:
        return  # no git — freshness is undecidable, fail open
    seen = driver_seen()
    if any(n not in seen for n in REGISTRY):
        return  # never-seen workloads outrank staleness
    stale = stale_names()
    in_window = [n for n in DRIVER_WINDOW if n in stale]
    if len(stale) >= 40:
        assert len(in_window) >= 40, (
            f"only {len(in_window)} stale workloads in the window; with "
            f"{len(stale)} stale overall the rotation must re-verify >=40 "
            "(VERDICT r8 #6)"
        )
    else:
        left_out = sorted(n for n in stale if n not in DRIVER_WINDOW)
        assert not left_out, f"stale workloads missing from the window: {left_out}"
