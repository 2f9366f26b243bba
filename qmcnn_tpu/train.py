"""Training entry point (SURVEY.md L5):

  python -m qmcnn_tpu.train --config configs/tfim16_sgd.yaml \
      [--override section.key=value ...]

Runs the full VMC loop over the walker mesh (all visible devices), streams
metrics to stdout/CSV, checkpoints via Orbax, and — for exactly
diagonalizable systems (n_sites <= 20) — reports the relative error vs the
ED ground energy (the BASELINE acceptance metric).
"""
from __future__ import annotations

import argparse
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp

import numpy as np

from qmcnn_tpu import configs as cfglib
from qmcnn_tpu.builder import build_lattice, build_sharded
from qmcnn_tpu.utils.metrics import MetricsLogger


def exact_reference_energy(cfg) -> Optional[float]:
    """ED ground energy for small systems (host scipy Lanczos)."""
    lattice = build_lattice(cfg)
    if lattice.n_sites > 20 or not cfg.run.validate_against_ed:
        return None
    from qmcnn_tpu.ops import exact

    h = cfg.hamiltonian
    if h.kind == "tfim":
        sp = exact.sparse_tfim(lattice.n_sites, lattice.nn_bonds, j=h.j,
                               h=h.h, hz=h.hz)
    elif h.kind == "heisenberg":
        sp = exact.sparse_heisenberg(lattice.n_sites, lattice.nn_bonds, j=h.j,
                                     delta=h.delta)
    elif h.kind == "j1j2":
        sp = exact.sparse_heisenberg(lattice.n_sites, lattice.nn_bonds,
                                     j=h.j, nnn_bonds=lattice.nnn_bonds,
                                     j2=h.j2, delta=h.delta)
    elif h.kind == "xyz":
        sp = exact.sparse_xyz(lattice.n_sites, lattice.nn_bonds, jx=h.jx,
                              jy=h.jy, jz=h.jz, hx=h.hx, hz=h.hz)
    else:
        return None
    return exact.ground_energy(sp)


def therm_chunks(total: int, per: int):
    """Dispatch schedule for chunked thermalization: [(sweep_offset, n)].

    ``per <= 0`` (or >= total) keeps the single-dispatch layout. Chunking
    costs at most two distinct compiled sweep counts (``per`` and the
    tail remainder).
    """
    if total <= 0:
        return []
    if per <= 0 or per >= total:
        return [(0, total)]
    return [(off, min(per, total - off)) for off in range(0, total, per)]


def chunked_thermalize(sharded, state, key, n_sweeps: int, per: int):
    """Thermalize in bounded dispatches (see therm_chunks): one all-sweeps
    dispatch exceeds the tunnel's ~80s kill on large lattices with deep
    models. Per-chunk keys fold in the sweep offset, so the schedule is
    deterministic in the seed (though the stream differs from the
    single-dispatch layout — thermalization only needs equilibration, not
    a bit-stable stream). Shared by train() and the measure CLI."""
    for offset, n in therm_chunks(n_sweeps, per):
        state = sharded.thermalize(state, jax.random.fold_in(key, offset),
                                   n_sweeps=n)
    return state


def _heartbeat(path: Optional[str], step: int) -> None:
    """Liveness marker for qmcnn_tpu.supervise: '<step> <unix-time>'.

    Rewritten after every completed dispatch; the supervisor watches the
    mtime and restarts the run (from its checkpoint) if it goes stale.
    Best-effort — a failed write must never kill training. Atomic
    (tmp + rename): the supervisor polls concurrently, and an open("w")
    truncation window would let it read an empty file and mistake a live
    child for one that never beat (observed once on the p15b hero leg —
    killed after 50 min of completed dispatches as "no first heartbeat").
    """
    if not path:
        return
    try:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"{step} {time.time()}\n")
        os.replace(tmp, path)
    except OSError:
        pass


def _event(hb_path: Optional[str], name: str, step: int,
           extra: str = "") -> None:
    """Append '<unix-time> <name> <step> [extra]' to <heartbeat>.events.

    Wedge forensics (BASELINE.md r4 ops note: all three r4 tunnel wedges
    clustered within ~25 steps of an Orbax save, with async saving OFF —
    so the mechanism is unknown): timestamping save_start/save_end/
    dispatch_start/dispatch_end makes the save-to-wedge interval a
    measured quantity instead of a suspicion. Best-effort, append-only
    (a few lines per dispatch; the supervisor never reads it).
    """
    if not hb_path:
        return
    try:
        with open(hb_path + ".events", "a") as f:
            f.write(f"{time.time():.3f} {name} {step}"
                    + (f" {extra}" if extra else "") + "\n")
    except OSError:
        pass


def _post_save_settle(cfg, hb_path: Optional[str], step: int) -> None:
    """Device ping (+ optional cool-down) between a save and the next
    dispatch: if the save stalled the host/tunnel, the ping absorbs and
    measures the stall instead of the next 40s training dispatch hitting
    it — the suspected r4 wedge shape. Ping duration lands in .events."""
    import jax.numpy as jnp

    t0 = time.perf_counter()
    try:
        jax.block_until_ready(jnp.zeros(()) + 1.0)
    except Exception:
        pass
    _event(hb_path, "save_ping", step, f"{time.perf_counter() - t0:.3f}s")
    if cfg.run.save_settle_s > 0:
        time.sleep(cfg.run.save_settle_s)


def train(cfg, ckpt_manager=None, logger=None):
    """Run the configured experiment; returns (final state, logger)."""
    sharded, params, lattice = build_sharded(cfg)
    n_sites = lattice.n_sites
    m = cfg.sampler.n_walkers
    # under multi-host every process computes identical (pmean-replicated)
    # metrics; only process 0 writes/prints them
    is_main = jax.process_index() == 0
    resuming = (ckpt_manager is not None
                and ckpt_manager.latest_step() is not None)
    logger = logger or MetricsLogger(
        csv_path=cfg.run.csv_path if is_main else None,
        print_every=cfg.run.log_every if is_main else 0,
        tensorboard_dir=cfg.run.tensorboard_dir if is_main else None,
        # a supervisor restart must not truncate the earlier attempt's CSV
        append=resuming)
    if cfg.run.init_from and not resuming:
        from qmcnn_tpu.utils.transfer import warm_start

        params = warm_start(params, cfg.run.init_from,
                            step=cfg.run.init_from_step,
                            expand=cfg.run.init_expand)
        if cfg.run.init_noise > 0:
            # symmetry/saddle breaking on warm starts: a converged state
            # is a stationary point of its own optimization (and, under
            # deflation, an unstable EIGENSTATE of the deflated operator)
            # — a small isotropic kick lets the run move off it without
            # waiting on MC noise (the by-hand recipe of the r3 excited
            # attempts, now a config knob)
            nkey = jax.random.key(cfg.run.seed + 424242)
            leaves, treedef = jax.tree_util.tree_flatten(params)
            nkeys = jax.random.split(nkey, len(leaves))
            # RELATIVE kick: init_noise x each leaf's own RMS, so one
            # setting works across layers/param_scales (an absolute 0.05
            # kick equals the whole param scale of a scale-0.05 net and
            # destroys the state — measured in the r4 smoke run)
            leaves = [
                leaf + (cfg.run.init_noise
                        * jnp.sqrt(jnp.mean(leaf * leaf))
                        * jax.random.normal(k, leaf.shape, leaf.dtype))
                for k, leaf in zip(nkeys, leaves)]
            params = jax.tree_util.tree_unflatten(treedef, leaves)

    key = jax.random.key(cfg.run.seed + 100)
    state = sharded.init_state(jax.random.fold_in(key, 0), m, params)

    start_step = 0
    if resuming:
        state = ckpt_manager.restore(state)
        start_step = int(state.step)
        print(f"resumed from checkpoint at step {start_step}")
    else:
        state = chunked_thermalize(sharded, state,
                                   jax.random.fold_in(key, 1),
                                   cfg.sampler.n_therm_sweeps,
                                   cfg.run.therm_sweeps_per_dispatch)

    e_exact = exact_reference_energy(cfg)
    sweeps_per_step = cfg.sampler.n_sweeps_per_step
    if cfg.run.nan_policy not in ("rollback", "halt", "ignore"):
        raise ValueError(f"unknown run.nan_policy {cfg.run.nan_policy!r}")
    nan_retries = 0
    base_key0 = jax.random.fold_in(key, 2)
    base_key = base_key0  # per-step keys derived on device from state.step

    run_steps = sharded.run_steps
    if cfg.run.checkify:
        from qmcnn_tpu.utils.debug import checked

        _checked_cache = {}

        def run_steps(state, key, n_steps):  # noqa: F811
            fn = _checked_cache.get(n_steps)
            if fn is None:
                fn = checked(lambda s, k: sharded.run_steps(s, k, n_steps))
                _checked_cache[n_steps] = fn
            return fn(state, key)

    it = start_step
    # NOTE: the first beat is only written after the first COMPLETED
    # dispatch — never before. The supervisor applies its (short) stall
    # timeout from the first beat onward; an earlier beat would start that
    # clock while the one-time XLA compile is still running and get the
    # child killed mid-compile (observed: wedges the chip for ~35 min).
    # Until the first beat, the supervisor's generous startup timeout
    # covers warm-start + thermalization + compile.
    hb_path = cfg.run.heartbeat_path if is_main else None
    steps_per_dispatch = cfg.run.steps_per_dispatch
    if steps_per_dispatch <= 0:
        # auto-size: measure one single-step dispatch (after compile) and
        # fill a ~40s budget — the tunneled TPU kills ~80s+ dispatches.
        # The timing dispatches are REAL training steps and the advanced
        # state is kept (per-step keys derive from state.step, so the MC
        # stream continues exactly); only their metrics go unlogged.
        t0 = time.perf_counter()
        state, m0 = run_steps(state, base_key, 1)
        jax.block_until_ready(m0.energy_re)
        compile_and_step = time.perf_counter() - t0
        t0 = time.perf_counter()
        state, m0 = run_steps(state, base_key, 1)
        jax.block_until_ready(m0.energy_re)
        dt1 = max(time.perf_counter() - t0, 1e-6)
        it = min(it + 2, cfg.run.n_steps)
        steps_per_dispatch = max(1, min(100, int(40.0 / dt1)))
        _heartbeat(hb_path, it)
        print(f"auto steps_per_dispatch: per-step {dt1:.3f}s (first incl. "
              f"compile {compile_and_step:.1f}s) -> {steps_per_dispatch}")

    while it < cfg.run.n_steps:
        chunk = min(steps_per_dispatch, cfg.run.n_steps - it)
        t0 = time.perf_counter()
        watchdog = None
        if cfg.run.dispatch_warn_s > 0:
            import threading

            watchdog = threading.Timer(
                cfg.run.dispatch_warn_s,
                lambda: print(
                    f"WARNING: dispatch at step {it} has been blocked for "
                    f"> {cfg.run.dispatch_warn_s:.0f}s — the TPU tunnel "
                    "may be wedged (a healthy dispatch here takes "
                    "steps_per_dispatch x per-step time). If this "
                    "repeats, restart the run; it resumes from the last "
                    "checkpoint.", flush=True))
            watchdog.daemon = True
            watchdog.start()
        _event(hb_path, "dispatch_start", it)
        try:
            state, metrics = run_steps(state, base_key, chunk)
            jax.block_until_ready(metrics.energy_re)
        finally:
            if watchdog is not None:
                watchdog.cancel()
        dt = (time.perf_counter() - t0) / chunk
        _event(hb_path, "dispatch_end", it + chunk)
        _heartbeat(hb_path, it + chunk)
        e_re = np.asarray(metrics.energy_re)
        if cfg.run.nan_policy != "ignore" and not np.isfinite(e_re).all():
            bad_step = it + int(np.flatnonzero(~np.isfinite(e_re))[0]) + 1
            # decided identically on every process (metrics are
            # pmean-replicated), so the rollback restore is collective-safe
            can_roll = (cfg.run.nan_policy == "rollback"
                        and ckpt_manager is not None
                        and ckpt_manager.latest_step() is not None
                        and nan_retries < cfg.run.nan_max_retries)
            if not can_roll:
                raise RuntimeError(
                    f"non-finite energy at step {bad_step} "
                    f"(run.nan_policy={cfg.run.nan_policy}"
                    + (f", retries exhausted {nan_retries}"
                       if nan_retries else "")
                    + (", no checkpoint to roll back to"
                       if ckpt_manager is None
                       or ckpt_manager.latest_step() is None else "")
                    + ") — a diverged state NaNs every later step; lower "
                    "optimizer.lr or raise sr.diag_shift0")
            nan_retries += 1
            state = ckpt_manager.restore(state)
            it = int(state.step)
            # a deterministic replay from the checkpoint would NaN at the
            # same step — re-fold the MC stream so the retry explores a
            # different sample path (documented stream change)
            base_key = jax.random.fold_in(base_key0, nan_retries)
            print(f"non-finite energy at step {bad_step}: rolled back to "
                  f"checkpoint step {it} with a re-folded MC key "
                  f"(retry {nan_retries}/{cfg.run.nan_max_retries})",
                  flush=True)
            continue
        e_im = np.asarray(metrics.energy_im)
        e_var = np.asarray(metrics.energy_var)
        acc = np.asarray(metrics.accept_rate)
        gn = np.asarray(metrics.grad_norm)
        sri = np.asarray(metrics.sr_iters)
        for j in range(chunk):
            step_no = it + j + 1
            if step_no % cfg.run.log_every == 0 or step_no == cfg.run.n_steps:
                row = {
                    "energy_re": float(e_re[j]),
                    "energy_im": float(e_im[j]),
                    "energy_var": float(e_var[j]),
                    "e_per_site": float(e_re[j]) / n_sites,
                    "accept": float(acc[j]),
                    "grad_norm": float(gn[j]),
                    "sr_iters": int(sri[j]),
                    "sweeps_per_sec": sweeps_per_step * m / max(dt, 1e-9),
                }
                if cfg.optimizer.orthogonalize_to:
                    row["overlap"] = float(
                        np.asarray(metrics.overlap)[j])
                if cfg.optimizer.sector_momentum is not None:
                    # the overlap metric slot carries the sector weight
                    # |<P_q>| in sector mode (vmc.step): the key
                    # convergence diagnostic (weight -> 1 under kappa)
                    row["sector_weight"] = float(
                        np.asarray(metrics.overlap)[j])
                if e_exact is not None:
                    row["rel_err"] = abs(row["energy_re"] - e_exact) / abs(
                        e_exact)
                logger.log(step_no, row)
        it += chunk
        if (ckpt_manager is not None
                and (it // cfg.run.ckpt_every)
                > ((it - chunk) // cfg.run.ckpt_every)):
            _event(hb_path, "save_start", it)
            ckpt_manager.save(it, state)
            _event(hb_path, "save_end", it)
            _post_save_settle(cfg, hb_path, it)

    if ckpt_manager is not None:
        _event(hb_path, "save_start", cfg.run.n_steps)
        ckpt_manager.save(cfg.run.n_steps, state)
        _event(hb_path, "save_end", cfg.run.n_steps)

    if is_main:
        e_tail, e_err = logger.tail_energy()
        print(f"final energy (tail mean): {e_tail:.6f} +- {e_err:.6f}"
              f"  ({e_tail / n_sites:.6f}/site)")
        if e_exact is not None:
            rel = abs(e_tail - e_exact) / abs(e_exact)
            print(f"exact: {e_exact:.6f}  relative error: {rel:.3e}")
        if cfg.run.csv_path:
            _write_manifest(cfg, e_tail, e_err, e_exact, n_sites)
            _write_snapshot(cfg, state)
    return state, logger


def _write_snapshot(cfg, state) -> None:
    """Auto-export final params (and EMA, if on) as '<csv_path>.params.npz'.

    Orbax checkpoint trees under runs/*_ckpt/ are gitignored and die with
    the VM — three hero warm-start chains were lost that way this round,
    each costing hours of retraining on the tunneled chip. The flat .npz
    (a few hundred KB per hero) is committable, and ``run.init_from`` /
    ``utils/transfer.py`` accept it directly, so every finished run is now
    a durable warm-start point without a manual ``qmcnn_tpu.export`` step.
    Best-effort: never fails the run."""
    try:
        from qmcnn_tpu.utils.transfer import _flatten

        base = cfg.run.csv_path
        for field, tree in (("params", state.params), ("ema", state.ema)):
            if tree is None:
                continue
            flat = {k: np.asarray(v) for k, v in _flatten(tree).items()}
            if not flat:
                continue
            path = base + (".params.npz" if field == "params"
                           else ".ema.npz")
            np.savez(path, **flat)
            n_mb = sum(v.nbytes for v in flat.values()) / 1e6
            print(f"# snapshot: {len(flat)} {field} leaves "
                  f"({n_mb:.2f} MB) -> {path}", flush=True)
    except Exception as e:  # pragma: no cover - diagnostics only
        print(f"# snapshot write failed: {e}", flush=True)


def _write_manifest(cfg, e_tail, e_err, e_exact, n_sites) -> None:
    """Provenance sidecar '<csv_path>.meta.json' (SURVEY.md §5
    observability): everything needed to reproduce or audit a run —
    the resolved config, code revision, software/device environment,
    and the headline result. Best-effort: never fails the run."""
    import json
    import subprocess

    try:
        rev = subprocess.run(
            ["git", "-C", os.path.dirname(os.path.abspath(__file__)),
             "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=10).stdout.strip() or None
    except Exception:
        rev = None
    try:
        dev = jax.devices()[0]
        manifest = {
            "name": cfg.name,
            "config": cfglib.to_yaml(cfg),
            "git_rev": rev,
            "jax_version": jax.__version__,
            "platform": dev.platform,
            "n_devices": jax.device_count(),
            "n_processes": jax.process_count(),
            "finished_unix": time.time(),
            "final_energy_tail": e_tail,
            "final_energy_stderr": e_err,
            "e_per_site": e_tail / n_sites,
            "e_exact": e_exact,
            "rel_err": (abs(e_tail - e_exact) / abs(e_exact)
                        if e_exact is not None else None),
        }
        with open(cfg.run.csv_path + ".meta.json", "w") as f:
            json.dump(manifest, f, indent=1)
    except Exception as e:  # pragma: no cover - diagnostics only
        print(f"# manifest write failed: {e}", flush=True)


def main(argv=None):
    from qmcnn_tpu.utils.platform import honor_platform_request
    honor_platform_request()
    from qmcnn_tpu.utils.chip_lock import acquire_chip_lock
    _chip_lock = acquire_chip_lock()  # held until process exit
    from qmcnn_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True, help="YAML config path")
    p.add_argument("--override", action="append", default=[],
                   metavar="section.key=value")
    args = p.parse_args(argv)
    cfg = cfglib.load(args.config, tuple(args.override))
    if cfg.run.distributed:
        # must run before first device use: afterwards jax.devices() spans
        # every process and the walker mesh / collectives are global
        from qmcnn_tpu.parallel.mesh import init_distributed

        init_distributed(cfg.run)
    if jax.process_index() == 0:
        print(f"=== {cfg.name} ===")
        print(cfglib.to_yaml(cfg))
    ckpt = None
    if cfg.run.ckpt_dir:
        from qmcnn_tpu.utils.checkpoint import CheckpointManager

        ckpt = CheckpointManager(cfg.run.ckpt_dir, keep=cfg.run.ckpt_keep)
    train(cfg, ckpt_manager=ckpt)


if __name__ == "__main__":
    main()
