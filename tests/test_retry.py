"""Application-level retry/backoff wrapper (functions/retry.py):
budgeted, ordered, backoff sequence, non-retryable passthrough."""

import pyarrow as pa
import pytest

from hyperion_crawler_ray.functions.retry import (
    RetryPolicy,
    TransientError,
    retrying,
    run_with_retry,
)


def _batch(n=4):
    return pa.table({"x": list(range(n))})


def test_succeeds_after_transient_failures():
    calls = {"n": 0}
    sleeps = []

    def fn(b):
        calls["n"] += 1
        if calls["n"] < 3:
            raise TransientError("flaky")
        return b

    pol = RetryPolicy(max_attempts=3, backoff_base_s=0.1,
                      backoff_mult=2.0, sleep=sleeps.append)
    out, attempts, last_err = run_with_retry(fn, _batch(), pol)
    assert attempts == 3
    assert out.num_rows == 4
    assert sleeps == [0.1, 0.2]  # exponential backoff sequence
    assert last_err == "TransientError: flaky"  # sampled for lineage


def test_budget_exhaustion_raises_last_error():
    def fn(b):
        raise TransientError("always down")

    pol = RetryPolicy(max_attempts=2, sleep=lambda s: None)
    with pytest.raises(TransientError):
        run_with_retry(fn, _batch(), pol)


def test_non_retryable_propagates_immediately():
    calls = {"n": 0}

    def fn(b):
        calls["n"] += 1
        raise ValueError("logic bug")

    pol = RetryPolicy(max_attempts=5, sleep=lambda s: None)
    with pytest.raises(ValueError):
        run_with_retry(fn, _batch(), pol)
    assert calls["n"] == 1  # no retry of non-transient errors


def test_retrying_wrapper_records_attempts_and_preserves_order():
    calls = {"n": 0}

    def fn(b):
        calls["n"] += 1
        if calls["n"] == 1:
            raise TransientError("once")
        return b

    wrapped = retrying(fn, RetryPolicy(max_attempts=3,
                                       sleep=lambda s: None),
                       attempts_col="attempts")
    out = wrapped(_batch())
    assert out.column("x").to_pylist() == [0, 1, 2, 3]  # order preserved
    assert out.column("attempts").to_pylist() == [2, 2, 2, 2]
