"""Cluster-wide side-channel counters (dropped-candidate reporting).

Operators that bound work per bucket (LSH candidate caps, degenerate
simhash buckets, near-dup bucket skips) must not drop recall silently.
They report drops through a named zero-CPU counter actor; pipelines and
tests read the counters after execution.

The actor must be created from the driver (``ensure()`` — named actors
die with their owner, so worker-created instances are fragile); workers
then find it by name (``get_if_exists``) in the job namespace.  ``incr``
blocks on the actor ack: drops are rare, the ack is ~ms, and it
guarantees every increment issued inside a dataset task is visible to a
``read()`` that runs after the dataset finished executing.
"""

from __future__ import annotations

import ray

_ACTOR_NAME = "rcr_metrics"


@ray.remote(num_cpus=0)
class _MetricsActor:
    def __init__(self) -> None:
        self.counters: dict[str, int] = {}

    def incr(self, name: str, n: int = 1) -> None:
        self.counters[name] = self.counters.get(name, 0) + int(n)

    def read(self) -> dict[str, int]:
        return dict(self.counters)

    def reset(self) -> None:
        self.counters.clear()


def _actor():
    # Explicit namespace: Ray Data workers run in an anonymous namespace
    # distinct from the driver's, so name-only lookup would miss.
    # Detached lifetime: callers hold only transient handles, and a
    # non-detached named actor dies as soon as its last handle is GC'd.
    return _MetricsActor.options(
        name=_ACTOR_NAME,
        namespace="rcr",
        get_if_exists=True,
        lifetime="detached",
    ).remote()


def ensure() -> None:
    """Create the driver-owned counter actor (call at pipeline build)."""
    _actor()


def incr(name: str, n: int = 1) -> None:
    """Counter increment, acknowledged (no-op when n == 0)."""
    if n:
        ray.get(_actor().incr.remote(name, n))


def read() -> dict[str, int]:
    return ray.get(_actor().read.remote())


def reset() -> None:
    ray.get(_actor().reset.remote())
