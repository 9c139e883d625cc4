"""Structured Streaming extensions (beyond-reference — SURVEY §2.11)."""

from __future__ import annotations

from .daily import ORACLES, streaming_daily_events

__all__ = ["ORACLES", "streaming_daily_events"]
