"""Scheduler: freewheel virtual time, dt injection, once-task priority."""

import pytest

from shaderflow_tpu.scheduler import Scheduler, SchedulerTask


def test_freewheel_perfect_frametimes():
    """Freewheel mode never sleeps and produces exact dt = period."""
    seen = []
    scheduler = Scheduler()
    scheduler.new(lambda dt: seen.append(dt), frequency=60, freewheel=True)
    for _ in range(5):
        scheduler.next()
    assert seen == pytest.approx([1 / 60] * 5)


def test_dt_injection_optional():
    called = []
    scheduler = Scheduler()
    scheduler.new(lambda: called.append(1), frequency=1000, freewheel=True)
    scheduler.next()
    assert called == [1]


def test_once_tasks_run_first_and_vanish():
    order = []
    scheduler = Scheduler()
    scheduler.new(lambda: order.append("recurring"), frequency=1000, freewheel=True)
    scheduler.once(lambda: order.append("once"), freewheel=True)
    scheduler.next()
    scheduler.next()
    assert order[0] == "once"
    assert all(t.once is False for t in scheduler.tasks)


def test_all_once():
    order = []
    scheduler = Scheduler()
    scheduler.new(lambda: order.append("recurring"), frequency=1000, freewheel=True)
    scheduler.once(lambda: order.append("a"), freewheel=True)
    scheduler.once(lambda: order.append("b"), freewheel=True)
    scheduler.all_once()
    assert order == ["a", "b"]
    assert len(scheduler.tasks) == 1


def test_frameskip_caps_dt():
    task = SchedulerTask(lambda dt: dt, frequency=10, freewheel=True, frameskip=False)
    task.last_call = -100.0  # pretend a huge stall
    task.next()
    assert task.output <= 1 / 10 + 1e-9


def test_next_call_advances_by_period():
    task = SchedulerTask(lambda: None, frequency=60, freewheel=True)
    task.next()
    assert task.next_call == pytest.approx(1 / 60)
    task.next()
    assert task.next_call == pytest.approx(2 / 60)
