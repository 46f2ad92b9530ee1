"""Exponential-backoff retry for idempotent catalog/storage calls.

Parity with the reference's BackoffRetryTask (common/BackoffRetryTask.java:
91-129; options :45-52 — 5 tries, 10 s initial, x2 backoff, jittered), used
there to survive flaky metastore Thrift RPCs. Our catalog is local JSON by
default, but the same wrapper guards any remote catalog/object-store call.

The fault-injection test mirrors FaultyCheckOutputSpecsTest.java:41-92:
fails after max tries, recovers when failures < tries.
"""

from __future__ import annotations

import random
import time
from dataclasses import dataclass
from typing import Callable, TypeVar

T = TypeVar("T")


@dataclass(frozen=True)
class RetryPolicy:
    """Defaults mirror BackoffRetryTask.java:45-52."""

    max_tries: int = 5
    initial_delay_s: float = 10.0
    backoff_factor: float = 2.0
    jitter_fraction: float = 0.1
    retryable: tuple[type[BaseException], ...] = (OSError, IOError)


def backoff_retry(
    fn: Callable[[], T],
    policy: RetryPolicy = RetryPolicy(),
    sleep: Callable[[float], None] = time.sleep,
    rng: random.Random | None = None,
) -> T:
    """Run ``fn`` with exponential backoff; re-raise after ``max_tries``.

    ``sleep``/``rng`` are injectable for tests (no wall-clock waiting).
    Only exceptions in ``policy.retryable`` are retried — anything else
    (a genuine logic error) propagates immediately, like the reference
    retrying only TException paths.
    """
    rng = rng or random.Random()
    delay = policy.initial_delay_s
    for attempt in range(1, policy.max_tries + 1):
        try:
            return fn()
        except policy.retryable:
            if attempt == policy.max_tries:
                raise
            jitter = 1.0 + policy.jitter_fraction * (2 * rng.random() - 1)
            sleep(delay * jitter)
            delay *= policy.backoff_factor
    raise AssertionError("unreachable")
