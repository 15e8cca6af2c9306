"""Tuning-creep tripwire for the driver-solve caps (r16 VERDICT item 8).

The small-input driver solves (linkgraph pagerank/HITS, dedup connected
components) are bounded-collect shortcuts: below the cap the graph is
collected ONCE and solved in numpy / a union-find, above it the
distributed loop runs unchanged. The caps are driver-safety constants,
NOT performance knobs — they must never grow to "whatever makes the
bench's graph fit". At the current values the collected state is a few
hundred MB of Python heap worst-case (see the constants' docstrings),
well inside the 8 GB driver; growing them is a memory-safety change
that needs its own review, not a bench tweak.
"""

from __future__ import annotations


def test_linkgraph_driver_solve_caps_never_grow():
    from mbfbigdatarandomforest_spark.operators import linkgraph as lg

    assert lg.DRIVER_SOLVE_MAX_NODES <= 100_000
    assert lg.DRIVER_SOLVE_MAX_EDGES <= 1_000_000


def test_cc_driver_solve_cap_never_grows():
    from mbfbigdatarandomforest_spark.operators import dedup as dd

    assert dd.CC_DRIVER_SOLVE_MAX_EDGES <= 1_000_000
