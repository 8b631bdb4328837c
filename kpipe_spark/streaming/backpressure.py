"""Lag-based backpressure governor (SURVEY §2.5 R4).

Reference semantics (BackpressureController.java:24-136): a pure
decision module with two watermarks — pause consumption when the
monitored metric (consumer lag) reaches the high watermark, resume when
it drains to the low watermark (hysteresis so the consumer doesn't
flap). Defaults 10_000 / 7_000 (BackpressureController.java:34-36);
total lag = Σ max(0, endOffset - position) over assigned partitions
(BackpressureController.java:164-186).

Spark translation: Structured Streaming has no pause()/resume() — the
admission knob is the per-trigger row budget (maxOffsetsPerTrigger).
The governor therefore maps PAUSE -> shrink the next trigger's
admission (geometrically, floored at min_admission) and RESUME ->
restore it to max_admission. Spark fixes source options at query start,
so the recommended admission applies to the next (re)start — the
steady-state loop is: poll ``Handle.govern()`` (which folds
``lastProgress`` lag into the governor), and when the recommendation
changes materially, roll the query with
``kafka_source(max_offsets_per_trigger=governor.admission)``. The
decision core stays side-effect-free, exactly like the reference
record.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

#: Defaults lifted from BackpressureController.java:34-36.
DEFAULT_HIGH_WATERMARK = 10_000
DEFAULT_LOW_WATERMARK = 7_000


class Action(enum.Enum):
    """BackpressureController.Action (PAUSE / RESUME / NONE)."""

    PAUSE = "PAUSE"
    RESUME = "RESUME"
    NONE = "NONE"


def kafka_lag(progress: dict | None) -> int:
    """Total source lag from a ``StreamingQuery.lastProgress`` dict.

    Mirrors calculateTotalLag (BackpressureController.java:164-186):
    lag = Σ max(0, latestOffset - endOffset) per topic-partition, where
    ``endOffset`` is where this batch stopped reading and
    ``latestOffset`` is the broker head. Spark's Kafka source reports
    both as {topic: {partition: offset}} maps; a missing latestOffset
    (non-Kafka sources) contributes 0, same as the reference's
    ``getOrDefault(tp, position)``.
    """
    if not progress:
        return 0
    total = 0
    for src in progress.get("sources", []) or []:
        end, latest = src.get("endOffset"), src.get("latestOffset")
        if not isinstance(end, dict) or not isinstance(latest, dict):
            continue
        for topic, parts in latest.items():
            if not isinstance(parts, dict):
                continue
            end_parts = end.get(topic, {}) if isinstance(end.get(topic), dict) else {}
            for part, head in parts.items():
                pos = end_parts.get(part, head)
                total += max(0, int(head) - int(pos))
    return total


@dataclass
class BackpressureGovernor:
    """Hysteresis admission governor — the pure decision core.

    ``check`` reproduces BackpressureController.check verbatim;
    ``observe`` folds a lag sample into the next-trigger admission
    recommendation. No I/O, no Spark objects — callers feed it lag
    samples (``kafka_lag(query.lastProgress)``) and read ``admission``.
    """

    high_watermark: int = DEFAULT_HIGH_WATERMARK
    low_watermark: int = DEFAULT_LOW_WATERMARK
    max_admission: int = 100_000
    min_admission: int = 1_000
    shrink_factor: float = 0.5
    paused: bool = False

    def __post_init__(self) -> None:
        if self.high_watermark <= 0:
            raise ValueError(f"highWatermark must be positive, got {self.high_watermark}")
        if self.low_watermark < 0:
            raise ValueError(f"lowWatermark cannot be negative, got {self.low_watermark}")
        if self.low_watermark >= self.high_watermark:
            raise ValueError(
                f"lowWatermark ({self.low_watermark}) must be less than "
                f"highWatermark ({self.high_watermark})"
            )
        self.admission = self.max_admission

    def check(self, metric: int, currently_paused: bool) -> Action:
        """Stateless watermark decision (BackpressureController.java:130-136)."""
        if not currently_paused and metric >= self.high_watermark:
            return Action.PAUSE
        if currently_paused and metric <= self.low_watermark:
            return Action.RESUME
        return Action.NONE

    def observe(self, lag: int) -> int:
        """Fold one lag sample into the admission recommendation.

        PAUSE (and every further over-watermark sample while paused)
        shrinks admission geometrically toward min_admission — the
        trigger-sized analogue of staying paused; RESUME restores
        max_admission in one step, like the reference un-pausing the
        consumer outright.
        """
        action = self.check(lag, self.paused)
        if action is Action.PAUSE:
            self.paused = True
        elif action is Action.RESUME:
            self.paused = False
            self.admission = self.max_admission
            return self.admission
        if self.paused and lag >= self.high_watermark:
            self.admission = max(
                self.min_admission, int(self.admission * self.shrink_factor)
            )
        return self.admission
