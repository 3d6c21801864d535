"""Pin the bench settle guard (r14 verdict ask #2): bench.py must
refuse to measure on a busy host — bounded sleep-retry with the
attempts and outcome recorded in the JSON evidence fields."""

from __future__ import annotations

import bench


def test_settle_guard_waits_until_quiet(monkeypatch):
    loads = iter([(4.0, 3.0, 2.0), (2.1, 2.0, 1.8), (0.7, 1.5, 1.6)])
    slept = []
    monkeypatch.setattr(bench.os, "getloadavg", lambda: next(loads))
    monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
    out = bench.wait_for_settle()
    assert out["settle_attempts"] == 2
    assert out["settled"] is True
    assert out["settle_waited_s"] == sum(slept) == 60.0


def test_settle_guard_gives_up_after_budget(monkeypatch):
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (9.9, 9.9, 9.9))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "SETTLE_MAX_WAIT_S", 90.0)
    out = bench.wait_for_settle()
    # 30 s steps against a 90 s budget: 3 attempts, then honest failure
    assert out["settle_attempts"] == 3
    assert out["settled"] is False
    assert out["settle_waited_s"] == 90.0


def test_settle_guard_noop_on_quiet_host(monkeypatch):
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (0.2, 0.3, 0.4))
    out = bench.wait_for_settle()
    assert out == {
        "settle_attempts": 0, "settle_waited_s": 0.0,
        "settle_threshold": bench.SETTLE_THRESHOLD, "settled": True,
    }
