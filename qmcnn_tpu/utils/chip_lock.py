"""Single-chip mutual exclusion for TPU-bound CLI runs.

Why this exists (observed twice in round-2 production, SURVEY.md §5
"failure detection"): this environment has ONE tunneled TPU chip, and the
axon backend happily multiplexes concurrent clients instead of refusing
the second one. Two overlapping runs then contend for HBM and dispatch
slots — a measure pass overlapping a train run wedged both (pipeline-16/18
incident), and a double-launched hero leg had two trainers appending to
the same CSV/checkpoint dir (pipeline-17/18 incident). Neither failure is
loud at launch time; both corrupt hours of work.

The fix is a plain ``flock`` on a well-known file: the kernel releases it
when the holder dies (including SIGKILL — no stale-lock cleanup needed),
and lock state is inspectable (the holder writes its pid + argv into the
file).

Coordination rules:

* ``qmcnn_tpu.supervise`` acquires the lock ONCE for its whole lifetime
  (restarts of its train child keep the chip reservation) and marks child
  environments with ``QMCNN_CHIP_LOCK_HELD`` so the child's own acquire is
  a no-op — a child blocking on its parent's lock would otherwise look
  like a startup stall and be killed at startup-timeout.
* Leaf CLIs (train/measure/evolve, bench.py) acquire it themselves when
  run unsupervised.
* CPU-forced runs (``JAX_PLATFORMS=cpu`` etc., see utils/platform.py)
  never touch the chip and skip the lock entirely, so host-side smoke
  runs stay concurrent.
* Waiting is bounded: after ``wait_s`` the caller proceeds WITHOUT the
  lock (loudly) — the lock is a guard rail for accidental overlap, not a
  scheduler; a wedged holder must not brick the driver's bench run.
"""
from __future__ import annotations

import errno
import fcntl
import os
import sys
import time
from typing import Optional, TextIO

ENV_PATH = "QMCNN_CHIP_LOCK"
ENV_HELD = "QMCNN_CHIP_LOCK_HELD"
DEFAULT_PATH = "/tmp/qmcnn_chip.lock"


def _platform_is_cpu() -> bool:
    req = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    return bool(req) and req != "axon" and "tpu" not in req


def _flock_holder_pid(path: str) -> Optional[int]:
    """Pid holding the flock on ``path``, from /proc/locks (Linux only).

    The pid WRITTEN INTO the lock file is unreliable here: a bare
    ``flock <file> cmd`` wrapper holds the kernel lock without ever
    writing its pid, leaving a previous holder's line in the file."""
    try:
        st = os.stat(path)
        with open("/proc/locks") as pl:
            for line in pl:
                parts = line.split()
                # "N: FLOCK ADVISORY WRITE <pid> <maj>:<min>:<ino> 0 EOF"
                if len(parts) >= 6 and parts[1] == "FLOCK":
                    maj, minor, ino = parts[5].split(":")
                    # device fields are hex in /proc/locks; matching on
                    # inode alone can attribute an unrelated filesystem's
                    # lock with a colliding inode to us
                    if (int(ino) == st.st_ino
                            and int(maj, 16) == os.major(st.st_dev)
                            and int(minor, 16) == os.minor(st.st_dev)):
                        return int(parts[4])
    except (OSError, ValueError, IndexError):
        pass
    return None


def _pid_holds_file(pid: int, path: str) -> bool:
    """Best-effort check that ``pid`` has ``path`` open (same dev+inode).

    Guards the ancestor-bypass against pid recycling: the /proc/locks pid
    is the ORIGINAL acquirer, which may have exited while a descendant
    keeps the fd; a recycled pid matching one of our ancestors must not
    silently skip the reservation. Returns True when verification is
    impossible (fd dir unreadable) — the ancestor match then stands on
    its own, as before.
    """
    try:
        st = os.stat(path)
    except OSError:
        return False
    fd_dir = f"/proc/{pid}/fd"
    try:
        fds = os.listdir(fd_dir)
    except OSError:
        # pid gone -> definitely not the holder; unreadable (perms) ->
        # cannot verify, accept the ancestor match
        return os.path.exists(f"/proc/{pid}")
    for fd in fds:
        try:
            fst = os.stat(os.path.join(fd_dir, fd))
        except OSError:
            continue
        if fst.st_ino == st.st_ino and fst.st_dev == st.st_dev:
            return True
    return False


def _is_ancestor(pid: int) -> bool:
    """True when ``pid`` is this process or one of its ancestors."""
    try:
        cur = os.getpid()
        for _ in range(64):
            if cur == pid:
                return True
            if cur <= 1:
                return False
            with open(f"/proc/{cur}/stat") as f:
                # ppid is the 2nd field after the ')' closing comm
                cur = int(f.read().rsplit(")", 1)[1].split()[1])
    except (OSError, ValueError, IndexError):
        pass
    return False


def acquire_chip_lock(wait_s: float = 10800.0, poll_s: float = 5.0,
                      log=print) -> Optional[TextIO]:
    """Acquire the single-chip lock; returns the held file (keep it alive).

    Returns None without locking when the run is CPU-forced, when a parent
    supervisor already holds the lock (``QMCNN_CHIP_LOCK_HELD``), or when
    ``wait_s`` elapses (after logging that the run proceeds unlocked).
    The lock is released automatically when the returned file is closed or
    the process exits/dies.
    """
    if os.environ.get(ENV_HELD):
        return None
    if _platform_is_cpu():
        return None
    path = os.environ.get(ENV_PATH, DEFAULT_PATH)
    try:
        f = open(path, "a+")
    except OSError as e:
        log(f"chip-lock: cannot open {path} ({e}) — proceeding unlocked")
        return None
    deadline = time.monotonic() + wait_s
    warned = False
    while True:
        try:
            fcntl.flock(f.fileno(), fcntl.LOCK_EX | fcntl.LOCK_NB)
            break
        except OSError as e:
            if e.errno not in (errno.EAGAIN, errno.EACCES):
                log(f"chip-lock: flock failed ({e}) — proceeding unlocked")
                return f  # keep fd open; harmless
        holder_pid = _flock_holder_pid(path)
        if (holder_pid is not None and _is_ancestor(holder_pid)
                and _pid_holds_file(holder_pid, path)):
            # e.g. the CLI was wrapped in a bare `flock <file> cmd`:
            # the reservation is already ours — blocking on it would
            # deadlock the run against its own wrapper (observed with a
            # hand-rolled pipeline wrapper, ninth r2 session). The
            # _pid_holds_file cross-check keeps a recycled pid that
            # merely matches an ancestor from triggering this. NOTE the
            # bypass also fires when an ancestor is genuinely USING the
            # chip (spawned us without ENV_HELD) — keep that overlap
            # visible rather than silent:
            log(f"chip-lock: held by ancestor pid={holder_pid} — "
                "treating as already reserved (if that ancestor is "
                "actively using the chip itself, this run OVERLAPS it)",
                flush=True)
            f.close()
            return None
        if not warned:
            try:
                f.seek(0)
                holder = f.read(200).strip()
            except OSError:
                holder = "?"
            log(f"chip-lock: chip busy (held by: {holder or '?'}) — "
                f"waiting up to {wait_s:.0f}s", flush=True)
            warned = True
        if time.monotonic() > deadline:
            log(f"chip-lock: still held after {wait_s:.0f}s — proceeding "
                "WITHOUT the lock (overlap risk accepted)", flush=True)
            return f
        time.sleep(poll_s)
    f.seek(0)
    f.truncate()
    f.write(f"pid={os.getpid()} argv={' '.join(sys.argv[:6])}\n")
    f.flush()
    if warned:
        log("chip-lock: acquired", flush=True)
    return f


def mark_held_env(env: dict) -> dict:
    """Return a child-process env dict marked as already-locked."""
    env = dict(env)
    env[ENV_HELD] = "1"
    return env
