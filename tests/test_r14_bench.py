"""Round-14 bench contention-dodging: the launch gate (bench.py
_launch_gate) waits out a contended pre-session window instead of only
declaring it (r13 verdict item 1a). The end-of-run recovery sweep is
exercised by the loaded smoke run documented in OPTIMIZATION_r14.md
(it needs a live Spark session and a real contention window)."""

from __future__ import annotations

import importlib.util
import os
import sys

_BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")
_spec = importlib.util.spec_from_file_location("bench_mod", _BENCH)
bench = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("bench_mod", bench)
_spec.loader.exec_module(bench)


def test_gate_quiet_launch_passes_through():
    slept: list[int] = []
    load, waited = bench._launch_gate(
        sample=lambda: 0.5, sleep=slept.append
    )
    assert (load, waited) == (0.5, 0)
    assert slept == []


def test_gate_waits_until_window_quiets():
    samples = iter([9.0, 8.5, 3.0])
    slept: list[int] = []
    load, waited = bench._launch_gate(
        sample=lambda: next(samples), sleep=slept.append
    )
    assert load == 3.0
    assert waited == 120  # two 60 s waits before the quiet sample
    assert slept == [60, 60]


def test_gate_budget_is_bounded():
    # a window that never quiets: the gate gives up after the budget
    # (10 × 60 s default) and launches anyway — the contended flag
    # still marks the artifact downstream
    slept: list[int] = []
    load, waited = bench._launch_gate(
        sample=lambda: 50.0, sleep=slept.append
    )
    assert load == 50.0
    assert waited == 600
    assert len(slept) == 10


def test_gate_env_overrides(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_WAIT_TRIES", "2")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_WAIT_STEP_S", "5")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_CONTENDED_LOAD", "1.0")
    slept: list[int] = []
    load, waited = bench._launch_gate(
        sample=lambda: 2.0, sleep=slept.append
    )
    assert load == 2.0
    assert waited == 10
    assert slept == [5, 5]
