"""Summarize <heartbeat>.events wedge forensics (VERDICT r4 item 6).

The r4 observation: all three tunnel wedges clustered within ~25 steps
after an Orbax save, yet saves are SYNCHRONOUS (utils/checkpoint.py), so
the "concurrent async save + dispatch" suspect cannot be the mechanism.
The r5 instrumentation (train._event) timestamps every dispatch_start/
dispatch_end, save_start/save_end and the post-save device ping, so the
save-adjacent interaction becomes a measured quantity:

  * save duration (host stall while the tunnel idles),
  * post-save ping time (device/tunnel health immediately after a save),
  * the dispatch-time distribution split by save-adjacency — if
    post-save dispatches are systematically slower/stall-prone, the
    mechanism is a save-induced host/tunnel stall, and run.save_settle_s
    is the mitigation.

Usage: python scripts/wedge_events.py runs/*_ckpt/heartbeat.events
"""
import sys

import numpy as np


def parse(path):
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 3:
                continue
            rows.append((float(parts[0]), parts[1], int(parts[2]),
                         parts[3] if len(parts) > 3 else ""))
    return rows


def summarize(path):
    rows = parse(path)
    if not rows:
        return
    dispatches = []  # (step, duration, started_at)
    saves = []       # (step, duration)
    pings = []       # (step, seconds)
    open_d, open_s = {}, {}
    for t, name, step, extra in rows:
        if name == "dispatch_start":
            open_d[step] = t
        elif name == "dispatch_end":
            # dispatch_end logs step + chunk; match the open start
            if open_d:
                k = min(open_d, key=lambda s: abs(step - s))
                dispatches.append((k, t - open_d.pop(k), open_d.get(k, t)))
        elif name == "save_start":
            open_s[step] = t
        elif name == "save_end":
            if step in open_s:
                saves.append((step, t - open_s.pop(step)))
        elif name == "save_ping":
            try:
                pings.append((step, float(extra.rstrip("s"))))
            except ValueError:
                pass
    print(f"== {path}")
    if dispatches:
        d = np.asarray([x[1] for x in dispatches])
        print(f"  dispatches: n={d.size} median={np.median(d):.2f}s "
              f"p95={np.percentile(d, 95):.2f}s max={d.max():.2f}s "
              f"(at step {dispatches[int(d.argmax())][0]})")
    if saves:
        s = np.asarray([x[1] for x in saves])
        print(f"  saves:      n={s.size} median={np.median(s):.2f}s "
              f"max={s.max():.2f}s")
    if pings:
        p = np.asarray([x[1] for x in pings])
        print(f"  post-save device pings: n={p.size} "
              f"median={np.median(p)*1e3:.1f}ms max={p.max():.3f}s")
    if dispatches and saves:
        save_steps = np.asarray([x[0] for x in saves])
        post = np.asarray([x[1] for x in dispatches
                           if ((x[0] - save_steps >= 0)
                               & (x[0] - save_steps <= 25)).any()])
        rest = np.asarray([x[1] for x in dispatches
                           if not ((x[0] - save_steps >= 0)
                                   & (x[0] - save_steps <= 25)).any()])
        if post.size and rest.size:
            print(f"  dispatch time within 25 steps after a save: "
                  f"median={np.median(post):.2f}s (n={post.size}) vs "
                  f"elsewhere {np.median(rest):.2f}s (n={rest.size})")


if __name__ == "__main__":
    for p in sys.argv[1:]:
        summarize(p)
