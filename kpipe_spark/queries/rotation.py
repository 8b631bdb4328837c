"""Machine-derived driver-window rotation.

The external driver grades the FIRST 50 registry entries each round
(``FLAGSHIP_50``). Through round 8 that window was a hand-typed list
with a hand-typed rationale comment — and round 8's verdict caught the
failure mode: the comment said "47 round-4-era re-grades" but the list
held 46, silently dropping ``d24_dup_clusters``. This module replaces
the hand bookkeeping with a computation over the committed
``CORRECTNESS_r0*.json`` artifacts, and
``tests/test_rotation_window.py`` asserts ``FLAGSHIP_50`` matches it,
so a drifted list fails CI instead of aging a grade unnoticed.

Window composition rule (stalest-first evidence rotation):

1. **Sentinels** — ``q01_pricing_summary``, ``p01_outcome_accounting``,
   ``d05_minhash_neardup`` — graded every round for cross-round
   comparability of the grading machinery itself.
2. **First-time grades** — oracle-backed queries with no grade in any
   committed CORRECTNESS artifact (new ops registered after the prior
   window was committed), in registry order.
3. **Stalest oracle-backed queries** — remaining slots filled by
   ascending latest-grade round, ties broken by registry order.
   Deferred queries (the registry-order tail of the stalest era that
   doesn't fit) keep their old grade and therefore sort first in the
   NEXT round's window — the deferral is self-correcting, no note
   required.

Rows-only queries (no oracle SQL) are excluded by default: the driver
records ``err: no_oracle`` for them, which would spend a hash-pass
slot on a weaker check. Pass ``include_rows_only=True`` to refresh
rows-only evidence explicitly. As of round 11 the registry has NO
rows-only entries — the last three asterisks were retired (d23
reports the exact 3-gram Jaccard over MLlib-LSH candidates, d27
trains with the integer-exact fixed-point Lloyd, d28's merge loop is
unrolled into CTE rounds), so every query can hold a hash grade and
the exclusion is a dormant safety valve. Their pre-oracle rows-only
grades (rounds 2–5) still count for staleness ordering, which queues
them early in the round-11 window.
"""

from __future__ import annotations

import glob
import json
import os
import re

SENTINELS: tuple[str, ...] = (
    "q01_pricing_summary",
    "p01_outcome_accounting",
    "d05_minhash_neardup",
)

WINDOW_SIZE = 50


def latest_grades(repo_root: str | None = None) -> dict[str, int]:
    """Latest driver-grade round per query, from CORRECTNESS_r*.json.

    A query is "graded" in a round if it appears in that round's
    artifact at all — even an errored row is evidence the driver ran
    it; staleness is about when the driver last LOOKED, and a red row
    would have been acted on that round.
    """
    root = repo_root or os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            for name in json.load(f):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def compute_window(
    registry_order: list[str],
    oracle_backed: set[str],
    grades: dict[str, int],
    size: int = WINDOW_SIZE,
    sentinels: tuple[str, ...] = SENTINELS,
    include_rows_only: bool = False,
) -> tuple[str, ...]:
    """Compute the driver window per the module-docstring rule."""
    pos = {name: i for i, name in enumerate(registry_order)}
    eligible = [
        n
        for n in registry_order
        if n not in sentinels and (include_rows_only or n in oracle_backed)
    ]
    first_time = [n for n in eligible if n not in grades]
    stale_pool = sorted(
        (n for n in eligible if n in grades),
        key=lambda n: (grades[n], pos[n]),
    )
    window = list(sentinels) + first_time
    window += stale_pool[: size - len(window)]
    if len(window) > size:
        raise ValueError(
            f"sentinels + first-time grades ({len(window)}) exceed window "
            f"size {size}; widen the window or stagger registrations"
        )
    return tuple(window)


def current_window(include_rows_only: bool = False) -> tuple[str, ...]:
    """The window the NEXT driver round should grade, from live state.

    Registry order comes from ``canonical_order()``, NOT
    ``list(QUERIES)``: the raw dict's order is import-timing-dependent
    (a test module importing one query module directly hoists its
    registrations to the front for the whole process — caught round
    10 when the rotation tripwire false-fired only inside the full
    suite), and the window must be a pure function of committed
    state."""
    from kpipe_spark.queries import QUERIES, canonical_order

    registry_order = canonical_order()
    oracle_backed = {n for n, q in QUERIES.items() if q.oracle is not None}
    return compute_window(registry_order, oracle_backed, latest_grades(),
                          include_rows_only=include_rows_only)


if __name__ == "__main__":
    for name in current_window():
        print(name)
