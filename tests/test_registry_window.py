"""Pin the driver sweep window (VERDICT r3 task 4).

The grading driver sweeps the first 50 registry entries. Round 3's
window was maintained by module-import-order arithmetic, which rots
silently when any module adds a query. ``SWEEP_PRIORITY`` now pins the
window by name; these tests fail loudly if the window drifts.
"""

from __future__ import annotations

from spark_hive_spark.plans.registry import SWEEP_PRIORITY, all_queries

DRIVER_WINDOW = 50
REF_PINNED = (
    "ref_top5_nations_by_avg_acctbal",
    "ref_top5_finished_orders_by_price",
    "ref_building_acctbal_stats_by_nation",
    "ref_orc_roundtrip",
)


def test_priority_list_is_exactly_the_window():
    assert len(SWEEP_PRIORITY) == DRIVER_WINDOW
    assert len(set(SWEEP_PRIORITY)) == DRIVER_WINDOW, "duplicate names"


def test_every_priority_name_is_registered():
    qs = all_queries()
    missing = [n for n in SWEEP_PRIORITY if n not in qs]
    assert not missing, f"SWEEP_PRIORITY names not registered: {missing}"


def test_first_50_registry_entries_match_priority():
    first = list(all_queries())[:DRIVER_WINDOW]
    assert first == list(SWEEP_PRIORITY)


def test_reference_jobs_stay_pinned_first():
    assert SWEEP_PRIORITY[:4] == REF_PINNED


def test_no_registered_query_lost():
    # reordering must be a permutation, never a filter
    qs = all_queries()
    assert len(qs) >= 120


def test_r10_window_completes_attestation():
    """Every query with no driver CORRECTNESS row across ALL recorded
    rounds (i.e. this round's new additions) sits immediately after
    the 4 pinned ref_* jobs, so cumulative attestation stays
    complete; the remaining slots are re-attestations."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    if len(files) < 9:
        import pytest

        pytest.skip("driver CORRECTNESS history not present")
    swept: set[str] = set()
    for f in files:
        with open(f) as fh:
            swept.update(json.load(fh))
    never = {n for n in all_queries() if n not in swept}
    in_window = set(SWEEP_PRIORITY)
    missing = never - in_window
    assert not missing, f"never-swept queries outside the window: {missing}"
    # the never-swept set sits right after the pinned refs so it can't
    # fall out of a shortened sweep
    head = set(SWEEP_PRIORITY[4 : 4 + len(never)])
    assert never <= head | set(REF_PINNED)
