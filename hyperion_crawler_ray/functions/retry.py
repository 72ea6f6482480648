"""Application-level retry/backoff for fetch-like stages.

Re-derives the reference workflow's per-stage retry semantics — each
stage retries up to N times with exponential backoff on transient
errors (workflows/krx_etl_workflow.yaml:41-47, 113-119, 267-271;
api/src/config/etl_config.yaml:140-142) — as an order-preserving
per-batch wrapper: a batch is retried in place, so row order and batch
boundaries are unchanged and the retry budget applies independently per
batch (the reference's per-request budget, scaled to batches).

Ray's task-level retry handles worker death; this wrapper handles
APPLICATION errors (throttling, 5xx-style transient faults) that
re-raise from otherwise-healthy workers, and records how many attempts
each batch cost so lineage can aggregate retry counters.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


class TransientError(RuntimeError):
    """A retryable application fault (429/5xx analog)."""


@dataclass
class RetryPolicy:
    """Budgeted exponential backoff. ``max_attempts`` includes the first
    try; ``retryable`` lists the exception types worth retrying —
    anything else propagates immediately (the reference only retries
    throttle/server errors, not logic errors)."""
    max_attempts: int = 3
    backoff_base_s: float = 0.05
    backoff_mult: float = 2.0
    retryable: tuple = (TransientError,)
    sleep: object = field(default=time.sleep, repr=False)


def run_with_retry(fn, batch, policy: RetryPolicy):
    """Call ``fn(batch)`` under the policy. Returns ``(result, attempts,
    last_error)`` where ``last_error`` is the message of the most recent
    retried fault (None on a clean first try) — the reference's
    LoadResult keeps the first 10 error strings
    (api/src/etl/base/loader.py:58), so the caller can sample them into
    lineage. Raises the last error once the budget is exhausted."""
    delay = policy.backoff_base_s
    last_err = None
    for attempt in range(1, policy.max_attempts + 1):
        try:
            return fn(batch), attempt, last_err
        except policy.retryable as e:
            if attempt == policy.max_attempts:
                raise
            last_err = f"{type(e).__name__}: {e}"[:200]
            policy.sleep(delay)
            delay *= policy.backoff_mult
    raise AssertionError("unreachable")


def retrying(fn, policy: RetryPolicy | None = None,
             attempts_col: str | None = None):
    """Wrap a per-batch Arrow callable for ``map_batches``. With
    ``attempts_col`` the output rows carry how many attempts their
    batch needed, so a downstream aggregate can report retry counters
    per stage (reference CrawlerTaskLog.items_failed analog)."""
    import pyarrow as pa

    policy = policy or RetryPolicy()

    def wrapped(batch):
        out, attempts, _err = run_with_retry(fn, batch, policy)
        if attempts_col is not None:
            out = out.append_column(
                attempts_col,
                pa.array([attempts] * out.num_rows, pa.int32()))
        return out

    return wrapped
