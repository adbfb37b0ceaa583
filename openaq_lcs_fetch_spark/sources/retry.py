"""Bounded retry with exponential backoff for executor-side fetches.

The reference handles transient provider failures at RUN granularity:
the lambda's top-level catch publishes the error and exits, and the
queue redelivers the whole invocation (fetcher/index.js:30-33 — catch
→ publish('fetcher/error') → process.exit). Spark's equivalent
coarse-grained mechanism is task retry (spark.task.maxFailures), but a
failed task re-fetches its ENTIRE page range; for flaky provider APIs
the cheap first line of defense is retrying the single failed call.
This helper is that line: deterministic exponential backoff (no
wall-clock randomness — the jitter derives from the attempt number so
reruns behave identically), bounded attempts, and on exhaustion the
original exception propagates so task retry / run-level redelivery
still sees a genuine failure.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import TypeVar

R = TypeVar("R")

#: exceptions worth retrying: connectivity + HTTP-layer trouble. A
#: ValueError (bad payload shape) is NOT transient — retrying it only
#: hides a provider contract change.
TRANSIENT = (ConnectionError, TimeoutError, OSError)


def with_retries(
    fn: Callable[[], R],
    attempts: int = 4,
    base_delay_s: float = 0.2,
    transient: tuple[type[BaseException], ...] = TRANSIENT,
    sleep: Callable[[float], None] = time.sleep,
) -> R:
    """Run ``fn`` with up to ``attempts`` tries; backoff doubles per
    try (0.2, 0.4, 0.8, ...). Raises the LAST exception unchanged when
    exhausted — callers upstack (Spark task retry, the run log) must
    see the real failure, not a wrapper."""
    last: BaseException | None = None
    for i in range(attempts):
        try:
            return fn()
        except transient as exc:  # noqa: PERF203 (retry loop is the point)
            last = exc
            if i < attempts - 1:
                sleep(base_delay_s * (2**i))
    assert last is not None
    raise last
