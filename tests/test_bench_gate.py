"""Idle-box gate for the bench harness (r8 verdict ask #3).

The committed BENCH artifact was load-polluted two rounds running; the
gate makes that impossible: bench.py blocks until the 1-min load average
drops under the threshold and REFUSES (SystemExit(3), no stdout JSON)
when the box never goes idle within the wait budget. These tests drive
``wait_for_idle`` with fake clock/loadavg hooks — no Spark needed.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import wait_for_idle  # noqa: E402


def test_idle_box_passes_immediately():
    calls = []
    load = wait_for_idle(
        threshold=2.0,
        max_wait=100,
        poll=10,
        getloadavg=lambda: (0.42, 0, 0),
        sleep=calls.append,
        log=lambda m: None,
    )
    assert load == 0.42
    assert calls == []  # never slept


def test_retries_until_idle():
    readings = iter([5.0, 3.1, 1.9])
    slept = []
    load = wait_for_idle(
        threshold=2.0,
        max_wait=100,
        poll=10,
        getloadavg=lambda: (next(readings), 0, 0),
        sleep=slept.append,
        log=lambda m: None,
    )
    assert load == 1.9
    assert slept == [10, 10]  # two polls before the box went idle


def test_refuses_when_never_idle():
    logs = []
    with pytest.raises(SystemExit) as exc:
        wait_for_idle(
            threshold=2.0,
            max_wait=30,
            poll=10,
            getloadavg=lambda: (7.7, 0, 0),
            sleep=lambda s: None,
            log=logs.append,
        )
    assert exc.value.code == 3
    assert any("REFUSED" in m for m in logs)


def test_force_override(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_FORCE_BENCH", "1")
    load = wait_for_idle(
        threshold=2.0,
        max_wait=30,
        poll=10,
        getloadavg=lambda: (9.9, 0, 0),
        sleep=lambda s: (_ for _ in ()).throw(AssertionError("must not sleep")),
        log=lambda m: None,
    )
    assert load == 9.9  # recorded honestly in the artifact


# ---------------------------------------------------------------------------
# Throughput-stability probe (r11 verdict ask #2): load average cannot
# see a sagged box, so the harness refuses until a pinned probe query
# lands within budget of its committed reference time.
# ---------------------------------------------------------------------------

from bench import wait_for_stable_throughput  # noqa: E402


def test_probe_passes_when_fast():
    slept = []
    t = wait_for_stable_throughput(
        run_probe=lambda: 0.27,
        ref_sec=0.28,
        factor=1.15,
        max_attempts=5,
        retry_sleep=10,
        sleep=slept.append,
        log=lambda m: None,
    )
    assert t == 0.27
    assert slept == []  # first probe passed, never slept


def test_probe_retries_until_recovered():
    readings = iter([0.49, 0.41, 0.30])  # the NOTES #67a sag profile
    slept = []
    t = wait_for_stable_throughput(
        run_probe=lambda: next(readings),
        ref_sec=0.28,
        factor=1.15,
        max_attempts=5,
        retry_sleep=10,
        sleep=slept.append,
        log=lambda m: None,
    )
    assert t == 0.30
    assert slept == [10, 10]


def test_probe_refuses_on_persistent_sag():
    logs = []
    with pytest.raises(SystemExit) as exc:
        wait_for_stable_throughput(
            run_probe=lambda: 0.50,
            ref_sec=0.28,
            factor=1.15,
            max_attempts=3,
            retry_sleep=10,
            sleep=lambda s: None,
            log=logs.append,
        )
    assert exc.value.code == 3
    assert any("REFUSED" in m for m in logs)
    # exactly max_attempts probes, no committable artifact


def test_probe_force_override(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_FORCE_BENCH", "1")
    logs = []
    t = wait_for_stable_throughput(
        run_probe=lambda: 0.50,
        ref_sec=0.28,
        factor=1.15,
        max_attempts=3,
        retry_sleep=10,
        sleep=lambda s: (_ for _ in ()).throw(AssertionError("must not sleep")),
        log=logs.append,
    )
    assert t == 0.50  # recorded honestly in the artifact's probe_sec
    assert any("FORCED" in m for m in logs)
