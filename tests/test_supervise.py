"""Wedge-recovery supervisor (qmcnn_tpu/supervise.py; SURVEY.md §5
"failure detection / recovery").

The stall/restart logic is exercised against stub child processes that
script the observed production failure modes (heartbeat goes stale mid-run;
child never produces a first beat; hard crash loop), plus an end-to-end
check that train() actually emits the heartbeat file the supervisor needs.
"""
import pytest
import os
import stat
import sys
import textwrap

from qmcnn_tpu import configs as cfglib
from qmcnn_tpu.supervise import Supervisor, read_heartbeat


def _stub(tmp_path, name, body):
    """Write an executable python stub; argv[1]=heartbeat, argv[2]=statedir."""
    path = tmp_path / name
    path.write_text(textwrap.dedent(f"""\
        import os, sys, time
        hb = sys.argv[1]
        state = sys.argv[2]
        def beat(step):
            with open(hb, "w") as f:
                f.write(f"{{step}} {{time.time()}}\\n")
        {textwrap.indent(textwrap.dedent(body), '        ').strip()}
        """))
    path.chmod(path.stat().st_mode | stat.S_IEXEC)
    return str(path)


def _run(tmp_path, body, **kw):
    hb = str(tmp_path / "hb")
    script = _stub(tmp_path, "child.py", body)
    argv = [sys.executable, script, hb, str(tmp_path)]
    sup = Supervisor(argv, hb, poll_s=0.1, log=lambda *a: None, **kw)
    return sup.run(), hb


def test_clean_first_try(tmp_path):
    rc, _ = _run(tmp_path, """
        beat(1); beat(2)
        sys.exit(0)
    """, stall_timeout=60, startup_timeout=60, max_restarts=1)
    assert rc == 0


def test_stall_then_resume_finishes(tmp_path):
    # First child beats to step 3 then wedges (sleeps forever); the
    # restarted child sees the marker file ("checkpoint"), resumes, exits 0.
    rc, hb = _run(tmp_path, """
        marker = os.path.join(state, "ckpt_marker")
        if os.path.exists(marker):
            beat(6)
            sys.exit(0)
        open(marker, "w").close()
        beat(3)
        time.sleep(600)
    """, stall_timeout=1.0, startup_timeout=30, max_restarts=2)
    assert rc == 0
    assert read_heartbeat(hb)[0] == 6


@pytest.mark.slow
def test_no_first_heartbeat_is_killed(tmp_path):
    # Child never beats (wedged inside compile); second attempt succeeds.
    rc, _ = _run(tmp_path, """
        marker = os.path.join(state, "ckpt_marker")
        if os.path.exists(marker):
            beat(1)
            sys.exit(0)
        open(marker, "w").close()
        time.sleep(600)
    """, stall_timeout=60, startup_timeout=10, max_restarts=3)
    assert rc == 0


def test_crash_loop_gives_up(tmp_path):
    rc, _ = _run(tmp_path, """
        sys.exit(3)
    """, stall_timeout=5, startup_timeout=5, max_restarts=2)
    assert rc == 1


@pytest.mark.slow
def test_progress_refunds_restart_budget(tmp_path):
    # Each child advances one step past the last, then wedges; with
    # max_restarts=1 (one no-progress restart allowed) the run still
    # reaches the finishing child because every restart made progress.
    rc, hb = _run(tmp_path, """
        cnt = os.path.join(state, "count")
        n = int(open(cnt).read()) if os.path.exists(cnt) else 0
        open(cnt, "w").write(str(n + 1))
        beat(n + 1)
        if n + 1 >= 4:
            sys.exit(0)
        time.sleep(600)
    """, stall_timeout=1.0, startup_timeout=30, max_restarts=1)
    assert rc == 0
    assert read_heartbeat(hb)[0] == 4


def test_train_emits_heartbeat(tmp_path):
    """End-to-end: train() rewrites run.heartbeat_path after dispatches."""
    from qmcnn_tpu.train import train

    hb = tmp_path / "hb"
    cfg = cfglib.from_yaml(f"""
name: hbsmoke
lattice: {{shape: [8]}}
model: {{channels: [4]}}
hamiltonian: {{kind: tfim, h: 1.0}}
sampler: {{n_walkers: 32, move: flip, n_therm_sweeps: 2}}
optimizer: {{kind: sgd, lr: 0.05}}
run: {{n_steps: 4, steps_per_dispatch: 2, log_every: 2,
       heartbeat_path: '{hb}', csv_path: '{tmp_path}/m.csv',
       validate_against_ed: true}}
""")
    train(cfg)
    step, _mtime = read_heartbeat(str(hb))
    assert step == 4
    # provenance manifest sidecar written next to the CSV
    import json

    with open(tmp_path / "m.csv.meta.json") as f:
        meta = json.load(f)
    assert meta["name"] == "hbsmoke"
    assert meta["jax_version"]
    assert meta["rel_err"] is not None
    assert "n_walkers: 32" in meta["config"]


@pytest.mark.slow
def test_device_wait_probes_without_burning_budget(tmp_path):
    # Probe fails twice before the device "recovers"; with max_restarts=0
    # (zero tolerance for failed attempts) the run still succeeds because
    # probing holds the launch instead of spending a doomed attempt.
    probe_cnt = tmp_path / "probes"
    probe = _stub(tmp_path, "probe.py", """
        n = int(open(state).read()) if os.path.exists(state) else 0
        open(state, "w").write(str(n + 1))
        sys.exit(0 if n >= 2 else 1)
    """)
    hb = str(tmp_path / "hb")
    child = _stub(tmp_path, "child.py", """
        beat(1)
        sys.exit(0)
    """)
    sup = Supervisor([sys.executable, child, hb, str(tmp_path)], hb,
                     poll_s=0.05, log=lambda *a: None,
                     stall_timeout=30, startup_timeout=30, max_restarts=0,
                     device_wait=60,
                     device_probe_cmd=[sys.executable, probe, "unused",
                                       str(probe_cnt)])
    assert sup.run() == 0
    assert int(probe_cnt.read_text()) == 3  # 2 failures + 1 success


def test_device_wait_budget_expiry_launches_anyway(tmp_path):
    # Probe never succeeds; after device_wait expires the child is launched
    # regardless (and here completes fine).
    probe = _stub(tmp_path, "probe.py", """
        sys.exit(1)
    """)
    hb = str(tmp_path / "hb")
    child = _stub(tmp_path, "child.py", """
        beat(1)
        sys.exit(0)
    """)
    sup = Supervisor([sys.executable, child, hb, str(tmp_path)], hb,
                     poll_s=0.05, log=lambda *a: None,
                     stall_timeout=30, startup_timeout=30, max_restarts=0,
                     device_wait=0.2,
                     device_probe_cmd=[sys.executable, probe, "u",
                                       str(tmp_path)])
    assert sup.run() == 0


def test_read_heartbeat_robust(tmp_path):
    assert read_heartbeat(str(tmp_path / "missing")) is None
    bad = tmp_path / "bad"
    bad.write_text("not-a-step\n")
    assert read_heartbeat(str(bad)) is None


@pytest.mark.slow
def test_transient_heartbeat_glitch_does_not_kill(tmp_path):
    """A momentarily missing/unreadable heartbeat AFTER beats have been
    seen must be judged by the last known beat, not the startup branch
    (which past startup_timeout would kill a live child instantly —
    observed on the p15b hero leg). max_restarts=0: any kill fails."""
    rc, hb = _run(tmp_path, """
        beat(1)
        time.sleep(15)    # get well past startup_timeout
        os.remove(hb)     # the glitch: several polls see no file
        time.sleep(3)
        beat(2)
        sys.exit(0)
    """, stall_timeout=60, startup_timeout=10.0, max_restarts=0)
    assert rc == 0
    assert read_heartbeat(hb)[0] == 2


@pytest.mark.slow
def test_sigterm_reaps_the_child(tmp_path):
    """``timeout N supervise`` must not orphan the train child.

    Production class: pipeline timeouts SIGTERM the supervisor; before the
    handler existed the child (own process group) survived as a zombie
    trainer holding the chip while the next pipeline leg launched — the
    pipeline-16/18 overlap incident.
    """
    import signal
    import subprocess
    import time

    hb = str(tmp_path / "hb")
    child = _stub(tmp_path, "child.py", """
        with open(os.path.join(state, "childpid"), "w") as f:
            f.write(str(os.getpid()))
        time.sleep(120)
    """)
    driver = tmp_path / "driver.py"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    driver.write_text(textwrap.dedent(f"""\
        import sys
        sys.path.insert(0, {repo!r})
        from qmcnn_tpu.supervise import Supervisor
        sup = Supervisor([sys.executable, {child!r}, {hb!r}, {str(tmp_path)!r}],
                         {hb!r}, poll_s=0.1, startup_timeout=60,
                         log=lambda *a, **k: None)
        sys.exit(sup.run())
        """))
    proc = subprocess.Popen([sys.executable, str(driver)])
    pidfile = tmp_path / "childpid"
    deadline = time.time() + 30
    while not pidfile.exists() and time.time() < deadline:
        time.sleep(0.05)
    assert pidfile.exists(), "child never started"
    child_pid = int(pidfile.read_text())
    time.sleep(0.2)
    proc.send_signal(signal.SIGTERM)
    assert proc.wait(timeout=10) == 128 + signal.SIGTERM
    # the child's whole process group must be gone
    deadline = time.time() + 5
    while time.time() < deadline:
        try:
            os.kill(child_pid, 0)
        except ProcessLookupError:
            break
        time.sleep(0.05)
    else:
        os.kill(child_pid, 9)  # clean up before failing
        raise AssertionError("supervisor SIGTERM orphaned its child")
