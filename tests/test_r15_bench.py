"""Round-15 bench sweep accounting (VERDICT r14 item 5 + ADVICE):

* the end-of-run recovery sweep only replaces a recorded median with an
  INTERNALLY CONSISTENT sweep pass (median <= ratio x its own min — the
  r6 quiet-retry selection rule, which the r14 sweep skipped);
* when a sweep replaces any row, the final line self-documents it:
  ``sweep_applied`` (count) and ``presweep`` (the replaced rows'
  pre-sweep medians), so the uncorrected total is reconstructible from
  the last stdout line alone.
"""

from __future__ import annotations

import importlib.util
import os
import sys

_BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")
_spec = importlib.util.spec_from_file_location("bench_mod_r15", _BENCH)
bench = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("bench_mod_r15", bench)
_spec.loader.exec_module(bench)


def test_sweep_choice_applies_consistent_quieter_pass():
    med, apply = bench._sweep_choice(10.0, [4.0, 4.2, 4.1], 1.4)
    assert med == 4.1
    assert apply


def test_sweep_choice_rejects_dispersed_pass_even_if_quieter():
    # median 6.0 > 1.4 x min 2.0: the sweep pass itself was disturbed —
    # its median may not replace the recorded one (the one-sided
    # min-of-medians estimator the r6 advisor fix rejected)
    med, apply = bench._sweep_choice(10.0, [2.0, 6.0, 9.0], 1.4)
    assert med == 6.0
    assert not apply

def test_sweep_choice_rejects_slower_pass():
    med, apply = bench._sweep_choice(3.0, [4.0, 4.1, 4.2], 1.4)
    assert med == 4.1
    assert not apply


def test_sweep_choice_subsecond_floor():
    # sub-second medians disperse on noise alone; the 0.5 s floor from
    # the quiet-retry rule applies to the consistency check too
    med, apply = bench._sweep_choice(2.0, [0.1, 0.4, 0.45], 1.4)
    assert apply


def test_sweep_final_keys_present_when_sweep_fired():
    rec = {"metric": "headline_queries_total", "value": 1.0}
    bench._sweep_final_keys(rec, {"q_a": 12.34, "q_b": 5.06})
    assert rec["sweep_applied"] == 2
    assert rec["presweep"] == {"q_a": 12.3, "q_b": 5.1}


def test_sweep_final_keys_absent_when_no_sweep():
    rec = {"metric": "headline_queries_total", "value": 1.0}
    bench._sweep_final_keys(rec, {})
    assert "sweep_applied" not in rec
    assert "presweep" not in rec
