"""Run-configuration validation (SURVEY.md M23).

Restates the reference's argument validators (sparql_updates.py:218-259:
change-count range, ``Q\\d+`` entity-id shape, ``%Y-%m-%d %H:%M:%S`` window
bounds, start ≤ end) as a pure, testable kernel that raises typed errors
instead of printing-and-returning-False — a failed validation should kill a
distributed run loudly before any cluster work is scheduled.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass

DATE_FORMAT = "%Y-%m-%d %H:%M:%S"
MIN_CHANGES, MAX_CHANGES = 1, 500


class ConfigError(ValueError):
    pass


def validate_change_count(n) -> int:
    """Reference: rclimit capped to 1..500 (sparql_updates.py:218-231)."""
    try:
        v = int(n)
    except (TypeError, ValueError) as e:
        raise ConfigError(f"change count must be an integer, got {n!r}") from e
    if not (MIN_CHANGES <= v <= MAX_CHANGES):
        raise ConfigError(
            f"change count must be in [{MIN_CHANGES}, {MAX_CHANGES}], got {v}")
    return v


def validate_entity_id(s: str) -> str:
    """Reference: ``Q`` + digits (sparql_updates.py:233-238)."""
    if not (isinstance(s, str) and s.startswith("Q") and s[1:].isdigit()):
        raise ConfigError(f"invalid entity id {s!r} (expected Q<digits>)")
    return s


def parse_window_date(s: str) -> _dt.datetime:
    """Reference: verify_date + strptime (sparql_updates.py:240-251)."""
    try:
        return _dt.datetime.strptime(s, DATE_FORMAT)
    except (TypeError, ValueError) as e:
        raise ConfigError(
            f"invalid date {s!r} (expected {DATE_FORMAT})") from e


@dataclass(frozen=True)
class RunWindow:
    """Validated (start, end] processing window; ``latest`` mirrors the
    reference's fallback when either bound is missing."""

    start: _dt.datetime | None
    end: _dt.datetime | None

    @property
    def latest(self) -> bool:
        return self.start is None or self.end is None

    @classmethod
    def from_args(cls, start: str | None, end: str | None) -> "RunWindow":
        s = parse_window_date(start) if start else None
        e = parse_window_date(end) if end else None
        if s and e and e < s:  # reference: (end-start).days < 0 check
            raise ConfigError(f"start {s} cannot be later than end {e}")
        return cls(s, e)
