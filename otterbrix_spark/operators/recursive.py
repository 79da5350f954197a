"""WITH RECURSIVE — driver-side fixpoint loop.

The reference implements recursive CTEs as `operator_recursive_cte`: run the
anchor plan, then repeatedly re-drive the recursive term over the previous
delta, UNION-ALL-accumulating until the delta is empty (reference
`components/physical_plan/operators/operator_recursive_cte.hpp:7-45`,
`components/sql/transformer/impl/transform_select.cpp:31-60`).

Spark has no recursive CTE, so the fixpoint loop runs on the driver while
every *step* stays a distributed DataFrame operation. Scale posture:

  - ``localCheckpoint`` per iteration truncates lineage — without it the plan
    doubles per step and Catalyst analysis becomes the bottleneck long before
    data does.
  - the delta is the only thing re-joined each round, so per-iteration cost is
    O(|delta| join |edges|), the same asymptotics as a distributed BFS.
  - ``max_iter`` caps runaway recursion (reference tests include a cycle
    fixture for exactly this).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def recursive_cte(
    anchor: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    *,
    max_iter: int = 100,
    distinct: bool = False,
    checkpoint_every: int = 1,
) -> DataFrame:
    """UNION ALL fixpoint: ``anchor UNION ALL step(anchor) UNION ALL ...``.

    ``step`` receives the previous iteration's delta and returns the next
    delta; iteration stops when the delta is empty or ``max_iter`` is hit.
    With ``distinct=True`` rows already accumulated are removed from each
    delta first (UNION semantics — guarantees termination on cyclic graphs).
    """
    acc = anchor.localCheckpoint(eager=True)
    delta = acc
    for i in range(max_iter):
        delta = step(delta)
        if distinct:
            delta = delta.exceptAll(acc).distinct()
        if checkpoint_every and i % checkpoint_every == 0:
            delta = delta.localCheckpoint(eager=True)
        if delta.isEmpty():
            break
        acc = acc.unionAll(delta).localCheckpoint(eager=True)
    return acc
