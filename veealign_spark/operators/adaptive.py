"""Size-adaptive dispatch threshold shared by the rank/curve operators.

The two-level rank/cumsum devices (scalable_rank, pr_curve) exist so no
corpus-sized table ever funnels through a single-partition Exchange —
the 10^12-turn plan. But they pay fixed costs (range-boundary sampling,
an eager materialization, a per-partition driver census) that dominate
on small inputs, where a plain ``Window.orderBy`` over one partition is
both correct and fastest. Operators therefore probe the input row count
and dispatch: plain window at or below the threshold, two-level above —
the same shape as ``connected_components``'s ``driver_threshold``
(canonicalize.py) and Spark's own broadcast-join threshold.

1M rows is comfortably one-task territory (a 1M-row sort is
milliseconds; the rows carried are id+score/key sized), and far below
it the two-level path's 2-3 extra jobs cost more than the sort.
"""

from __future__ import annotations

import os

SMALL_INPUT_ROWS = 1_000_000


def small_input_rows() -> int:
    """Dispatch threshold; env ``VEEALIGN_SMALL_INPUT_ROWS`` overrides
    (tests set it to 0 to force the scale path and plan-assert it)."""
    return int(os.environ.get("VEEALIGN_SMALL_INPUT_ROWS", SMALL_INPUT_ROWS))
