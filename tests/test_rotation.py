"""CI gate for the driver-verdict rotation policy (tools/rotation_check).

Fails when the current ``queries()`` head would leave any tail query's
latest green driver verdict more than 2 rounds old after the upcoming
round — the structural guard against the r2-tail spill that VERDICT r4
had to flag by hand.
"""

from __future__ import annotations

from tools.rotation_check import (
    HEAD_SLOTS,
    latest_green_rounds,
    stale_tail_queries,
)


def test_no_stale_tail_queries():
    upcoming, stale = stale_tail_queries()
    assert not stale, (
        f"round {upcoming}'s head (first {HEAD_SLOTS} queries()) strands "
        f"{len(stale)} tail queries past the 2-round verdict-age promise: "
        + ", ".join(f"{n} (r{last})" for n, last in stale)
    )


def test_artifacts_parse_and_cover_queries():
    latest = latest_green_rounds()
    # every recorded green verdict refers to a query that still exists
    import __spark_entry__ as entry

    names = set(entry.queries())
    vanished = [n for n in latest if n not in names and n != "cdc_route_join_distinct"]
    assert not vanished, f"verdict rows for queries no longer registered: {vanished}"


def test_docs_cover_every_query_and_refs_resolve():
    """SURVEY/README <-> code consistency: every registered query is
    documented; every module.function doc reference resolves."""
    from tools.coverage_check import dangling_doc_refs, undocumented_queries

    assert undocumented_queries() == []
    assert dangling_doc_refs() == []
