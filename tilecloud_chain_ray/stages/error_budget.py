"""Error budget (§2.9): abort when too many rows fail.

Reference: ``MaximumConsecutiveErrors`` (default 10) and
``MaximumErrorRate`` abort the run
(``/root/reference/tilecloud_chain/filter/error.py:6-67``, wiring
``__init__.py:284-298``).  In a distributed pipeline "consecutive" is
per-stream-order, which Ray doesn't guarantee; the equivalent contract
is a global budget: a detached counter actor accumulates error/success
counts from every batch and the stage raises ``ErrorBudgetExceeded``
once the budget trips, failing the job (partitions already committed
stay committed — resume semantics apply).
"""

from __future__ import annotations

import pyarrow as pa
import ray


class ErrorBudgetExceeded(RuntimeError):
    pass


@ray.remote
class _ErrorCounter:
    def __init__(self) -> None:
        self.errors = 0
        self.total = 0

    def add(self, errors: int, total: int) -> tuple[int, int]:
        self.errors += errors
        self.total += total
        return self.errors, self.total


def make_error_budget_stage(
    max_errors: int = 10,
    max_error_rate: float | None = None,
    min_sample: int = 100,
    counter=None,
):
    """Per-batch budget check; pass the same ``counter`` handle to every
    stage that should share one budget."""
    if counter is None:
        counter = _ErrorCounter.remote()

    def check(batch: pa.Table) -> pa.Table:
        n_err = 0
        if "status" in batch.schema.names:
            statuses = batch["status"].to_pylist()
            n_err = sum(1 for s in statuses if s == "error")
        errors, total = ray.get(counter.add.remote(n_err, batch.num_rows))
        if errors > max_errors:
            raise ErrorBudgetExceeded(
                f"{errors} errored rows exceed the budget of {max_errors}"
            )
        if (
            max_error_rate is not None
            and total >= min_sample
            and errors / total > max_error_rate
        ):
            raise ErrorBudgetExceeded(
                f"error rate {errors}/{total} exceeds {max_error_rate:.2%}"
            )
        return batch

    check.counter = counter  # type: ignore[attr-defined]
    return check
