"""Per-host politeness token buckets, enforced inside fetch partitions.

The reference's politeness is fixed `time.sleep(3/5/10/30)` between
navigations plus a 10 s request timeout (reference: app/scrapers/
ga_scraper.py:404,411,726; util.py:74). The engine replaces that with a
token bucket per host, living inside each fetch partition. Host→partition
affinity (urlkit.salted_part) guarantees a host's bucket state is held by
at most ``salt`` partitions per wave; with salt=1 (the parity config) the
budget is exact, with salt>1 each sub-partition gets rate/salt.

Clocks are injectable so tests run with a simulated clock (no wall sleep)
and the bench uses a deterministic latency model instead of the network.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class SimClock:
    """Virtual clock: sleep() advances time instantly; now() reads it."""

    t: float = 0.0

    def now(self) -> float:
        return self.t

    def sleep(self, s: float) -> None:
        self.t += max(s, 0.0)


@dataclass
class TokenBucket:
    """rate tokens/sec, burst capacity; acquire() blocks until a token."""

    rate: float
    capacity: float = 1.0
    clock_now: callable = time.monotonic
    clock_sleep: callable = time.sleep
    tokens: float = field(default=None)  # type: ignore[assignment]
    last: float = field(default=None)  # type: ignore[assignment]

    def __post_init__(self):
        if self.tokens is None:
            self.tokens = self.capacity
        if self.last is None:
            self.last = self.clock_now()

    def acquire(self) -> float:
        """Take one token, sleeping if necessary; returns the wait time."""
        now = self.clock_now()
        self.tokens = min(self.capacity, self.tokens + (now - self.last) * self.rate)
        self.last = now
        if self.tokens >= 1.0:
            self.tokens -= 1.0
            return 0.0
        need = (1.0 - self.tokens) / self.rate
        self.clock_sleep(need)
        self.last = self.clock_now()
        self.tokens = 0.0
        return need


class HostPacer:
    """One token bucket per host, lazily created inside a fetch partition.

    A host's rate can be overridden per-row via ``acquire(host, rate)``
    (the fetch stage passes the robots Crawl-delay joined onto the wave
    as a column — no driver-side host dict at 10^8-host scale) or via the
    ``rate_overrides`` dict (small/test configurations). Per-row rate
    wins; hosts with neither use the default rate.
    """

    def __init__(
        self,
        rate_per_host: float,
        salt: int = 1,
        sim: bool = False,
        rate_overrides: dict[str, float] | None = None,
    ):
        # With salted co-location up to `salt` sub-partitions may host
        # the same domain; each lane enforces rate/lanes (per-row lane
        # counts win; `salt` is the fallback divisor).
        self.salt = max(salt, 1)
        self.base_rate = rate_per_host
        self.rate = rate_per_host / self.salt
        self.overrides = rate_overrides or {}
        self.sim = sim
        self.clock = SimClock() if sim else None
        self._buckets: dict[str, TokenBucket] = {}

    def acquire(
        self, host: str, rate: float | None = None, lanes: int | None = None
    ) -> float:
        """``lanes``: the host's ACTUAL fetch-lane count (pop_wave's
        adaptive n_lanes column). The per-lane budget divides by it; the
        constructor ``salt`` remains the fallback divisor for callers
        without the column (a small host with one lane is then paced at
        the FULL configured rate, not rate∕salt)."""
        b = self._buckets.get(host)
        if b is None:
            div = max(int(lanes), 1) if lanes is not None else self.salt
            if rate is None:
                rate = self.overrides.get(host, None)
            rate = (rate / div) if rate is not None else self.base_rate / div
            b = TokenBucket(
                rate=rate,
                capacity=1.0,
                clock_now=self.clock.now if self.sim else time.monotonic,
                clock_sleep=self.clock.sleep if self.sim else time.sleep,
            )
            self._buckets[host] = b
        return b.acquire()
