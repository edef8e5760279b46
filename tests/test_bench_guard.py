"""The bench.py ambient-contention baseline guard (round-12, verdict ask #5):
a full-suite run whose TOTAL balloons >1.25x against the committed baseline
while the PER-QUERY MEDIAN ratio stays <1.05 carries the contention
signature (SCALE.md round-11: two of five runs inflated 1.4-1.8x with clean
guest vitals) and must be refused the BENCH_DETAIL baseline stamp. Pure
decision function — no Spark session needed."""

import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_spec = importlib.util.spec_from_file_location(
    "bench_mod",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
)
bench_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench_mod)
compute_baseline_guard = bench_mod.compute_baseline_guard


def _shared(times, prev):
    common = [n for n in times if n in prev]
    return sum(times[n] for n in common), sum(prev[n] for n in common)


def test_guard_trips_on_contention_signature():
    # three heavy queries inflated 2x (dominate the total), twenty light
    # ones flat — median ~1.0, total well past 1.25x
    prev = {f"q{i}": 0.5 for i in range(20)}
    prev.update({"h1": 10.0, "h2": 10.0, "h3": 10.0})
    times = dict(prev)
    for h in ("h1", "h2", "h3"):
        times[h] = prev[h] * 2.0
    now, old = _shared(times, prev)
    g = compute_baseline_guard(times, prev, now, old)
    assert g["tripped"] is True
    assert g["median_ratio"] < 1.05 < g["total_ratio"]


def test_guard_holds_on_coherent_code_regression():
    # a real regression moves most queries together: median rises with the
    # total, so the run IS the new truth and must stamp
    prev = {f"q{i}": 1.0 for i in range(10)}
    times = {n: v * 1.5 for n, v in prev.items()}
    now, old = _shared(times, prev)
    g = compute_baseline_guard(times, prev, now, old)
    assert g["tripped"] is False


def test_guard_holds_on_flat_and_improved_runs():
    prev = {f"q{i}": 1.0 + 0.1 * i for i in range(8)}
    flat = dict(prev)
    now, old = _shared(flat, prev)
    assert compute_baseline_guard(flat, prev, now, old)["tripped"] is False
    faster = {n: v * 0.7 for n, v in prev.items()}
    now, old = _shared(faster, prev)
    assert compute_baseline_guard(faster, prev, now, old)["tripped"] is False


def test_guard_ignores_jitter_rows_and_empty_baseline():
    # sub-50ms baseline rows are excluded from the median (pure jitter);
    # with no usable rows the guard abstains (None), it never blocks
    prev = {"tiny": 0.01}
    times = {"tiny": 0.04}
    assert compute_baseline_guard(times, prev, 0.04, 0.01) is None
    assert compute_baseline_guard({}, {}, 0.0, 0.0) is None


def test_guard_force_override(monkeypatch):
    monkeypatch.setenv("BENCH_FORCE_BASELINE", "1")
    prev = {f"q{i}": 0.5 for i in range(20)}
    prev.update({"h1": 30.0})
    times = dict(prev, h1=60.0)
    now, old = _shared(times, prev)
    g = compute_baseline_guard(times, prev, now, old)
    assert g["tripped"] is True and g["forced"] is True
