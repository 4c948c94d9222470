"""Chip-lease lock (movenet_tpu.utils.chiplock) + bench leg machinery.

The lock closes the round-4 lease-collision class: the official bench
and every recovery/ops script take the same flock, so two JAX
processes can never share the tunnel (VERDICT r4 item 2 — a wall-clock
guard guessed wrong; flock releases on holder death, no stale state).
"""

import json
import os
import time

import pytest

from movenet_tpu.utils.chiplock import ChipLockTimeout, chip_lock


def test_acquire_release(tmp_path):
    path = str(tmp_path / "chip.lock")
    with chip_lock("t1", timeout_s=1, path=path) as lk:
        body = (tmp_path / "chip.lock").read_text()
        assert f"pid={os.getpid()}" in body and "name=t1" in body
        assert lk._fd is not None
    # released: a zero-timeout acquire succeeds immediately
    with chip_lock("t2", timeout_s=0, path=path):
        pass


def test_contention_times_out_and_reports_holder(tmp_path):
    path = str(tmp_path / "chip.lock")
    with chip_lock("holder", timeout_s=1, path=path):
        t0 = time.monotonic()
        with pytest.raises(ChipLockTimeout) as ei:
            with chip_lock("waiter", timeout_s=0.3, path=path):
                pass
        assert time.monotonic() - t0 >= 0.25
        assert "name=holder" in str(ei.value)


def test_reentry_after_exception(tmp_path):
    path = str(tmp_path / "chip.lock")
    with pytest.raises(RuntimeError):
        with chip_lock("x", timeout_s=1, path=path):
            raise RuntimeError("boom")
    with chip_lock("y", timeout_s=0, path=path):
        pass


def test_released_on_process_death(tmp_path):
    """SIGKILLing the holder releases the flock (the property a pidfile
    cannot give): no stale-lock detection needed."""
    import signal
    import subprocess
    import sys

    path = str(tmp_path / "chip.lock")
    child = subprocess.Popen(
        [sys.executable, "-c",
         "import sys, time;"
         "sys.path.insert(0, %r);"
         "from movenet_tpu.utils.chiplock import chip_lock;"
         "lk = chip_lock('child', timeout_s=1, path=%r).__enter__();"
         "print('held', flush=True); time.sleep(60)"
         % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            path)],
        stdout=subprocess.PIPE, text=True)
    try:
        assert child.stdout.readline().strip() == "held"
        with pytest.raises(ChipLockTimeout):
            with chip_lock("parent", timeout_s=0.2, path=path):
                pass
        child.send_signal(signal.SIGKILL)
        child.wait(timeout=10)
        deadline = time.monotonic() + 5
        while True:
            try:
                with chip_lock("parent", timeout_s=0.2, path=path):
                    break
            except ChipLockTimeout:
                if time.monotonic() > deadline:
                    raise
    finally:
        if child.poll() is None:
            child.kill()


# --------------------------------------------------------- bench legs

def test_bench_leg_machinery(tmp_path, monkeypatch):
    """Per-leg budgets, skip-and-annotate, incremental emission: a
    consumer taking the LAST JSON line always sees the most complete
    merged record (round-4 VERDICT item 1 — BENCH_r04 was zeroed by a
    single end-of-run print)."""
    import bench

    monkeypatch.setattr(bench, "SIDECAR", tmp_path / "partial.json")
    monkeypatch.setattr(bench, "_DEADLINE", time.monotonic() + 120.0)
    record = {"legs_completed": [], "legs_skipped": {}, "value": None}
    monkeypatch.setattr(bench, "RECORD", record)

    def ok_leg():
        record["value"] = 42

    def failing_leg():
        raise ValueError("kernel went sideways")

    bench._leg("good", 5, ok_leg, needs_chip=False)
    bench._leg("bad", 5, failing_leg, needs_chip=False)
    record["chip_ok"] = False
    bench._leg("chipless", 5, ok_leg)  # needs chip -> skipped
    # under the 30s global floor -> skipped without running
    monkeypatch.setattr(bench, "_DEADLINE", time.monotonic() + 10.0)
    bench._leg("late", 5, ok_leg, needs_chip=False)

    sidecar = json.loads(
        (tmp_path / "partial.json").read_text().strip())
    assert sidecar["value"] == 42
    assert [e["leg"] for e in sidecar["legs_completed"]] == ["good"]
    assert "ValueError" in sidecar["legs_skipped"]["bad"]
    assert sidecar["legs_skipped"]["chipless"] == "chip unreachable"
    assert "budget" in sidecar["legs_skipped"]["late"]


def test_bench_leg_timeout_not_swallowed(tmp_path, monkeypatch):
    """_LegTimeout must escape in-leg ``except Exception`` guards."""
    import signal

    import bench

    monkeypatch.setattr(bench, "SIDECAR", tmp_path / "partial.json")
    monkeypatch.setattr(bench, "_DEADLINE", time.monotonic() + 60.0)
    record = {"legs_completed": [], "legs_skipped": {}}
    monkeypatch.setattr(bench, "RECORD", record)
    old = signal.signal(signal.SIGALRM, bench._on_alarm)
    try:
        def greedy_leg():
            try:
                time.sleep(5)          # alarm fires in here
            except Exception:          # must NOT catch _LegTimeout
                pass

        t0 = time.monotonic()
        bench._leg("slow", 0.3, greedy_leg, needs_chip=False)
        assert time.monotonic() - t0 < 3
        assert "budget" in record["legs_skipped"]["slow"]
    finally:
        signal.signal(signal.SIGALRM, old)


def test_bench_fixture_params_roundtrip(tmp_path):
    import numpy as np

    import bench

    params = {"a": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
              "b": np.ones((4,), np.float32)}
    flat = bench._flatten_params(params)
    npz_path = tmp_path / "p.npz"
    np.savez(npz_path, **flat)
    loaded = bench._unflatten_params(
        params, np.load(npz_path, allow_pickle=False))
    assert np.array_equal(np.asarray(loaded["a"]["w"]), params["a"]["w"])
    assert np.array_equal(np.asarray(loaded["b"]), params["b"])
    bad = {"a": {"w": np.zeros((3, 2), np.float32)},
           "b": np.ones((4,), np.float32)}
    with pytest.raises(ValueError):
        bench._unflatten_params(bad, np.load(npz_path,
                                             allow_pickle=False))
