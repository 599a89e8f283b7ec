"""CI gate for the driver-verdict rotation policy (tools/rotation_check).

Fails when the current ``queries()`` head would leave any tail query's
latest green driver verdict more than 2 rounds old after the upcoming
round — the structural guard against the r2-tail spill that VERDICT r4
had to flag by hand.
"""

from __future__ import annotations

from tools.rotation_check import (
    HEAD_SLOTS,
    MAX_VERDICT_AGE,
    RETIREMENT_CANDIDATES,
    forecast_window,
    latest_green_rounds,
    stale_tail_queries,
)


def test_no_stale_tail_queries():
    upcoming, stale = stale_tail_queries()
    assert not stale, (
        f"round {upcoming}'s head (first {HEAD_SLOTS} queries()) strands "
        f"{len(stale)} tail queries past the verdict-age promise: "
        + ", ".join(f"{n} (r{last})" for n, last in stale)
    )


def test_forward_window_capacity_nonnegative():
    """The registration budget as a FAILING TEST, not a forecast field
    (VERDICT r11 item 4): after this head goes green, every round in
    the forward A-window must be seatable even in the no-smoothing
    worst case (each future round seats exactly its obligated set). A
    negative free count means some cohort cannot fit a 50-slot head no
    matter how the intervening sessions author — the infeasibility
    must fail CI in the round that CREATES it, when retirement or
    extra smoothing can still fix it."""
    window = forecast_window()
    bad = [(r, ob, fr) for r, ob, fr in window if fr < 0]
    assert not bad, (
        "forward rounds with infeasible heads "
        + ", ".join(f"r{r}: {ob} obligated ({fr} free)" for r, ob, fr in bad)
        + " — smooth more of the due cohort into this head, or retire/"
        f"fold (named candidates: {RETIREMENT_CANDIDATES})"
    )


def test_registration_within_capacity_bound():
    """Hard registry cap: Q <= HEAD_SLOTS * (A + 1). Beyond it the
    steady-state obligation ceil(Q / (A+1)) exceeds the head even with
    perfect smoothing. Fails with the named retirement/fold candidates
    (the freeze-and-fold rung of the capacity policy)."""
    import __spark_entry__ as entry

    q = len(entry.queries())
    cap = HEAD_SLOTS * (MAX_VERDICT_AGE + 1)
    assert q <= cap, (
        f"{q} registered > capacity bound {cap}: freeze registration and "
        f"fold redundant variants (candidates: {RETIREMENT_CANDIDATES})"
    )


def test_boundary_will_be_green_after_this_round():
    """Simulates the driver writing CORRECTNESS_r{HEAD_ROUND} for the
    current head (every head name's verdict becomes HEAD_ROUND): at
    the resulting boundary state — upcoming = HEAD_ROUND + 1, next
    session not yet started — every tail name whose verdict would age
    past the promise must be covered by NEXT_HEAD_PLAN. This is the
    check that ends the two-rounds-running pattern of the rotation
    guard flipping red the moment the round's artifacts land (VERDICT
    r11 item 1): the boundary's stale set is computable at authoring
    time, so the close must pre-author it."""
    import __spark_entry__ as entry

    from tools.rotation_check import ALLOWED_PENDING_DEBUTS

    latest = latest_green_rounds()
    names = list(entry.queries())
    assumed = {n: latest.get(n, -1) for n in names}
    head = set(names[:HEAD_SLOTS])
    for n in head:
        assumed[n] = entry.HEAD_ROUND
    nxt = entry.HEAD_ROUND + 1
    plan = set(entry.NEXT_HEAD_PLAN)
    # mirror stale_tail_queries' boundary rules EXACTLY (r12 review —
    # a divergent replica here could certify a boundary the real
    # guard flags red): plan coverage applies only to names with SOME
    # green verdict (a never-verified registration must use the
    # ALLOWED_PENDING_DEBUTS contract), and a deferral granted for
    # round nxt is itself coverage.
    uncovered = [
        n
        for n in names
        if n not in head
        and nxt - assumed[n] > MAX_VERDICT_AGE
        and not (n in plan and assumed[n] >= 0)
        and ALLOWED_PENDING_DEBUTS.get(n) != nxt
    ]
    assert not uncovered, (
        f"after r{entry.HEAD_ROUND} is written these tail names go stale at "
        f"the boundary and NEXT_HEAD_PLAN does not pre-author them: "
        f"{uncovered}"
    )


def test_next_head_plan_names_registered():
    """NEXT_HEAD_PLAN (the boundary protocol's pre-authored seats for
    the next round) must name only registered queries and fit inside a
    head together with nothing else pre-committed."""
    import __spark_entry__ as entry

    plan = getattr(entry, "NEXT_HEAD_PLAN", [])
    names = set(entry.queries())
    unknown = [n for n in plan if n not in names]
    assert not unknown, f"NEXT_HEAD_PLAN names not registered: {unknown}"
    assert len(plan) == len(set(plan)) <= HEAD_SLOTS


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
