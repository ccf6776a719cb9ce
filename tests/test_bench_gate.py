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
