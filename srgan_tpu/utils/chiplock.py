"""Cooperative single-chip occupancy markers.

The environment exposes ONE tunneled TPU chip; a benchmark that runs while a
training/eval job holds the chip records a silently-contended number (the
round-4 driver bench landed 14% low for exactly this reason).  There is no
kernel-level arbiter, so occupancy is advertised cooperatively: every
long-running chip job wraps itself in :func:`hold_chip`, which drops a
``<pid>.pid`` marker under :data:`LOCK_DIR`; ``bench.py`` calls
:func:`wait_chip_free` before timing and annotates its output when live
holders remain.

Markers are advisory (nothing blocks on them except the bench) and
self-cleaning: a marker whose pid is dead is removed on the next scan, so a
SIGKILLed job cannot wedge future benches.
"""

from __future__ import annotations

import contextlib
import errno
import os
import time

LOCK_DIR = os.environ.get("SRGAN_TPU_LOCK_DIR", "/tmp/srgan_tpu_chip_locks")


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except OSError as e:
        return e.errno == errno.EPERM   # exists, owned by someone else
    return True


def busy_pids(lock_dir: str | None = None) -> list[int]:
    """Live holder pids; stale (dead-pid / malformed) markers are removed."""
    d = lock_dir or LOCK_DIR
    if not os.path.isdir(d):
        return []
    alive = []
    for name in os.listdir(d):
        if not name.endswith(".pid"):
            continue
        path = os.path.join(d, name)
        try:
            pid = int(name[:-4])
        except ValueError:
            pid = -1
        if pid > 0 and _pid_alive(pid):
            alive.append(pid)
        else:
            with contextlib.suppress(OSError):
                os.unlink(path)
    return sorted(alive)


@contextlib.contextmanager
def hold_chip(label: str = "", lock_dir: str | None = None,
              only_on_tpu: bool = True):
    """Advertise this process as a chip holder for the with-block's duration.

    ``only_on_tpu`` keeps CPU test runs marker-free (the virtual-device test
    platform has no contention to advertise).
    """
    if only_on_tpu:
        import jax
        if jax.default_backend() != "tpu":
            yield
            return
    d = lock_dir or LOCK_DIR
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"{os.getpid()}.pid")
    with open(path, "w") as f:
        f.write(label or "chip job")
    try:
        yield
    finally:
        with contextlib.suppress(OSError):
            os.unlink(path)


def wait_chip_free(timeout_s: float, poll_s: float = 15.0,
                   lock_dir: str | None = None) -> list[int]:
    """Poll until no live holders remain or ``timeout_s`` elapses.

    Returns the (possibly empty) list of pids still holding at return time —
    empty means the chip is advertised free.
    """
    deadline = time.monotonic() + timeout_s
    while True:
        holders = busy_pids(lock_dir)
        if not holders or time.monotonic() >= deadline:
            return holders
        time.sleep(min(poll_s, max(deadline - time.monotonic(), 0.1)))
