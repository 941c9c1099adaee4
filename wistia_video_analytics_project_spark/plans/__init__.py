"""Plan inspection & assertion helpers.

The engine's scale posture is only real if the physical plans show it:
filters pushed into the parquet scan, pruned read schemas, broadcast
dimension joins, partial aggregation before exchanges, TakeOrdered for
top-k. These helpers make those properties ASSERTABLE in tests instead
of eyeballed — regressions in plan shape fail CI, not production.
"""

from .assertions import (  # noqa: F401
    assert_broadcast_join,
    assert_no_exchange,
    assert_pushed_filter,
    assert_read_columns_at_most,
    assert_take_ordered,
    executed_plan,
    plan_report,
)
