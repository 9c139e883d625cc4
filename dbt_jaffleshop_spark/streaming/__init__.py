"""Structured Streaming extensions (beyond-reference — SURVEY §2.11):
windowed daily rollup (daily.py) and a custom stateful sessionizer via
applyInPandasWithState (sessionize.py)."""

from __future__ import annotations

from .daily import ORACLES, streaming_daily_events
from .sessionize import streaming_sessionize

__all__ = ["ORACLES", "streaming_daily_events", "streaming_sessionize"]
