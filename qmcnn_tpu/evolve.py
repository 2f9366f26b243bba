"""Time-evolution entry point (t-VMC; ops/tdvp.py):

  # real-time quench, the standard protocol: train the ground state of
  # the PRE-quench Hamiltonian (h=2), then evolve it under the quenched
  # one (h=1). Validated: energy conserved to 1e-5, sx decays, szsz
  # grows, tdvp_error ~1e-4.
  python -m qmcnn_tpu.train --config configs/tfim16_sgd.yaml \
      --override hamiltonian.h=2.0 --override model.complex_params=true \
      --override run.ckpt_dir=/tmp/pre_ckpt
  python -m qmcnn_tpu.evolve --config configs/tfim16_sgd.yaml \
      --override hamiltonian.h=1.0 --override model.complex_params=true \
      --mode real --init-from /tmp/pre_ckpt --dt 0.01 --steps 100 \
      --sampling fullsum --solver dense

  # NOTE on --init-zero quenches: zeroed conv+lncosh params are a NEAR-
  # DEGENERATE manifold point — the tangent space spans only {const,
  # linear-in-s} directions, so the szsz-type motion of a TFIM quench
  # projects to ~nothing and the state barely moves (tdvp_error pins at
  # ~1; observed on the first 8x8 demo, runs/tvmc_tfim8x8_quench.log).
  # --init-perturb (default 1e-3) keeps the tangent space full-rank, but
  # the physical escape is still slow; prefer --init-from.

  # imaginary-time flow to the ground state (deterministic full-sum TDVP)
  python -m qmcnn_tpu.evolve --config configs/tfim16_sgd.yaml \
      --mode imag --dt 0.05 --steps 400 --sampling fullsum

Initial state: ``--init-from <ckpt_dir>`` (a trained state, e.g. the ground
state of the pre-quench Hamiltonian), ``--init-zero`` (all parameters zero:
log psi identically 0, i.e. the product state |+x>^N — the standard
sudden-quench initial condition), or the model's fresh random init.

Sampling: ``--sampling fullsum`` enumerates the basis (exact expectations,
n_sites <= ~16 free / ~18 in the S^z=0 sector) — the deterministic mode used
by the dynamics tests; ``--sampling mc`` advances the config's Metropolis
walkers alongside the state (production scale).

Per step the CSV gets: time, energy (conserved in real time — drift is an
integrator/sampling diagnostic), TDVP projection error epsilon^2, and model
observables (TFIM: <sigma_x>/N transverse magnetization + nearest-neighbor
<sigma_z sigma_z>/bond; Heisenberg/J1-J2: staggered M^2).
"""
from __future__ import annotations

import argparse
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from qmcnn_tpu import configs as cfglib
from qmcnn_tpu.builder import (build_hamiltonian, build_lattice, build_model,
                               model_log_psi_is_real, resolve_move)
from qmcnn_tpu.models.cnn import log_psi_apply
from qmcnn_tpu.ops.hamiltonians import TFIM
from qmcnn_tpu.ops.tdvp import TDVP, all_states, expectation, state_weights
from qmcnn_tpu.utils.metrics import MetricsLogger


def evolve(cfg, mode: str = "imag", dt: float = 0.01, n_steps: int = 100,
           solver: str = "minsr", diag_shift: float = 1e-4,
           integrator: str = "heun", sampling: str = "fullsum",
           init_from: Optional[str] = None, init_zero: bool = False,
           init_perturb: float = 1e-3,
           sector: str = "auto", csv_path: Optional[str] = None,
           log_every: int = 1, corr_csv: Optional[str] = None):
    """Run the evolution; returns (final params, logger)."""
    if mode == "real" and model_log_psi_is_real(cfg):
        # A real-parameter ansatz has a purely real tangent space, which is
        # ORTHOGONAL to the real-time TDVP velocity -i(H - <H>)|psi>: the
        # projected theta-dot is identically zero and the "dynamics" silently
        # freeze (tdvp_error pins at 1.0, every observable constant for all
        # t). Observed live on an RBM quench; the analogous misconfigs
        # (init-zero dead manifold above, momentum-on-GCNN) are guarded the
        # same way (SURVEY.md §3.5 validation posture).
        raise ValueError(
            "mode='real' needs a complex-capable ansatz: this model's log "
            "psi is real, so the real-time TDVP velocity projects to zero "
            "and the state cannot move. Set model.complex_params=true (or "
            "use a complex model family).")
    lattice = build_lattice(cfg)
    ham = build_hamiltonian(cfg, lattice)
    model = build_model(cfg, lattice)

    def log_psi_fn(params, s):
        return log_psi_apply(model, params, s)

    params = model.init(jax.random.key(cfg.run.seed),
                        jnp.ones((1, lattice.n_sites), jnp.float32))
    if init_from:
        from qmcnn_tpu.utils.transfer import warm_start

        params = warm_start(params, init_from)
    elif init_zero:
        # Exactly-zero parameters are a DEAD point of the variational
        # manifold for conv+lncosh stacks: every pre-activation is 0, so
        # tanh'(0)-weighted score functions vanish identically, the TDVP
        # tangent space is degenerate, and the state never moves (observed
        # on the first 8x8 quench demo: tdvp_error pinned at 1.0, sx at
        # 1.0 for all t — runs/tvmc_tfim8x8_quench.log). A tiny gaussian
        # perturbation represents the same physical |+x>^N state to
        # O(perturb^2) infidelity while making the tangent space full
        # rank; --init-perturb 0 restores exact zeros.
        params = jax.tree_util.tree_map(jnp.zeros_like, params)
        if init_perturb:
            leaves, treedef = jax.tree_util.tree_flatten(params)
            keys = jax.random.split(jax.random.key(cfg.run.seed + 1),
                                    len(leaves))
            leaves = [p + init_perturb * jax.random.normal(k, p.shape,
                                                           p.dtype)
                      for p, k in zip(leaves, keys)]
            params = jax.tree_util.tree_unflatten(treedef, leaves)

    with_im = not (mode == "imag" and model_log_psi_is_real(cfg))
    tdvp = TDVP(log_psi_fn=log_psi_fn, ham=ham, mode=mode, solver=solver,
                diag_shift=diag_shift, with_im=with_im,
                jacobian_chunk=cfg.sr.jacobian_chunk,
                chunk_size=cfg.run.chunk_size)

    # observables (beyond energy): cheap diagonal ones inline; <sigma_x> via
    # the operator-as-Hamiltonian trick (TFIM with J=0, h=1 has local value
    # -sum_i sigma_x — observables are operators, SURVEY.md R5 machinery)
    bonds = jnp.asarray(lattice.nn_bonds)
    stag = jnp.asarray(1 - 2 * lattice.sublattice_mask, jnp.float32)
    sx_op = TFIM(lattice, j=0.0, h=1.0) if cfg.hamiltonian.kind == "tfim" \
        else None

    def diag_obs(s, w):
        out = {}
        zz = (s[:, bonds[:, 0]] * s[:, bonds[:, 1]]).mean(axis=1)
        out["szsz_nn"] = (w * zz).sum()
        ms = (s * stag[None, :]).mean(axis=1)
        out["stag_m2"] = (w * ms * ms).sum()
        return out

    # --corr-csv: track the full equal-time C(r, t) = <S^z_0 S^z_r>(t)
    # along the evolution (its FFT is S(q, t) — the standard light-cone /
    # order-melting diagnostic after a quench). Weighted so the same code
    # serves fullsum (Born weights) and MC (uniform) sampling.
    if corr_csv is not None and lattice.basis != 1:
        raise ValueError("--corr-csv needs a 1-site-basis lattice")

    def weighted_corr(s, w):
        m = s.shape[0]
        sz = s.reshape(m, *lattice.shape) / 2.0
        axes = tuple(range(1, 1 + lattice.ndim))
        cs = []
        for r in range(lattice.n_sites):
            shift = tuple(int(c) for c in lattice.coords[r])
            rolled = jnp.roll(sz, shift, axis=axes)
            cs.append(((sz * rolled).reshape(m, -1).mean(axis=1) * w).sum())
        return jnp.stack(cs)

    if corr_csv is not None:
        _orig_diag_obs = diag_obs

        def diag_obs(s, w):  # noqa: F811 — wrap to add the correlation row
            out = _orig_diag_obs(s, w)
            out["_corr"] = weighted_corr(s, w)
            return out

    sz_zero = (sector == "sz0" if sector != "auto"
               else cfg.hamiltonian.kind in ("heisenberg", "j1j2"))

    if sampling == "fullsum":
        states = jnp.asarray(all_states(lattice.n_sites, sz_zero=sz_zero))

        def resample(p):
            return states, state_weights(log_psi_fn, p, states)

        @jax.jit
        def step_fn(p):
            s, w = resample(p)
            if integrator == "heun":
                new, r = tdvp.step_heun(p, dt, s, w, resample=resample)
            else:
                new, r = tdvp.step_euler(p, dt, s, w)
            obs = diag_obs(s, w)
            if sx_op is not None:
                obs["sx"] = -expectation(log_psi_fn, p, sx_op, s, w).re \
                    / lattice.n_sites
            return new, r, obs

        def run_step(p, walkers, key):
            new, r, obs = step_fn(p)
            return new, walkers, r, obs
        walkers = None
    elif sampling == "mc":
        from qmcnn_tpu.sampler.metropolis import MetropolisSampler

        move = resolve_move(cfg)
        sampler = MetropolisSampler(
            log_psi_fn, n_sites=lattice.n_sites, move=move,
            bonds=lattice.nn_bonds if move.startswith("exchange") else None,
            sweep_size=cfg.sampler.sweep_size, backend="xla",
            lattice_shape=tuple(lattice.shape))
        m = cfg.sampler.n_walkers
        ids = jnp.arange(m)
        walkers = sampler.init_state(params, jax.random.key(cfg.run.seed + 1),
                                    m)
        walkers = jax.jit(partial(sampler.sample,
                                  n_sweeps=cfg.sampler.n_therm_sweeps))(
            params, walkers, jax.random.key(cfg.run.seed + 2), ids)

        @jax.jit
        def step_fn(p, ws, key):
            ws = sampler.reset_counters(ws)
            ws = sampler.refresh(p, ws)
            ws = sampler.sample(p, ws, key, ids,
                                n_sweeps=cfg.sampler.n_sweeps_per_step)
            w = jnp.full((m,), 1.0 / m)
            if integrator == "heun":
                new, r = tdvp.step_heun(p, dt, ws.s, w)  # stage-2 reuse
            else:
                new, r = tdvp.step_euler(p, dt, ws.s, w)
            obs = diag_obs(ws.s, w)
            if sx_op is not None:
                obs["sx"] = -expectation(log_psi_fn, p, sx_op, ws.s, w).re \
                    / lattice.n_sites
            return new, ws, r, obs

        def run_step(p, ws, key):
            return step_fn(p, ws, key)
    else:
        raise ValueError(f"unknown sampling {sampling!r}")

    logger = MetricsLogger(csv_path=csv_path, print_every=log_every)
    corr_file = None
    if corr_csv is not None:
        corr_file = open(corr_csv, "w")
        corr_file.write("t," + ",".join(
            f"c{r}" for r in range(lattice.n_sites)) + "\n")
    key = jax.random.key(cfg.run.seed + 3)
    t0 = time.perf_counter()
    for it in range(n_steps):
        params, walkers, r, obs = run_step(params, walkers,
                                           jax.random.fold_in(key, it))
        corr_t = obs.pop("_corr", None)
        if corr_file is not None and (
                (it + 1) % log_every == 0 or it + 1 == n_steps):
            vals = np.asarray(corr_t)
            corr_file.write(",".join(
                [f"{(it + 1) * dt:.6f}"] + [f"{v:.8f}" for v in vals]) + "\n")
            corr_file.flush()
        # terminal-blowup check EVERY iteration, not only on logged steps:
        # with log_every > 1 the old logged-only check let up to
        # log_every-1 NaN steps burn chip time, and a trajectory whose
        # params went non-finite while the logged energy was transiently
        # finite slipped through. Energy is already materialized per step
        # (r.energy), so this costs one host scalar; the param-norm guard
        # catches the params-first failure mode.
        e_re = float(np.asarray(r.energy.re))
        bad = not np.isfinite(e_re)
        if not bad:
            # one fused device reduction -> ONE host scalar per step
            # (per-leaf float() costs a device sync per leaf)
            pnorm = float(sum(jnp.sum(jnp.abs(p))
                              for p in jax.tree_util.tree_leaves(params)))
            bad = not np.isfinite(pnorm)
        if bad or (it + 1) % log_every == 0 or it + 1 == n_steps:
            row = {
                "t": (it + 1) * dt,
                "energy_re": e_re,
                "energy_im": float(np.asarray(r.energy.im)),
                "e_per_site": e_re / lattice.n_sites,
                "e_var": float(np.asarray(r.e_var)),
                "tdvp_error": float(np.asarray(r.tdvp_error)),
                "solver_residual": float(np.asarray(r.residual)),
                "steps_per_sec": (it + 1) / max(time.perf_counter() - t0,
                                                1e-9),
            }
            for k, v in obs.items():
                row[k] = float(np.asarray(v))
            logger.log(it + 1, row)
            if bad:
                # capacity blowups are terminal for TDVP (the parameter
                # state itself is non-finite; there is no rollback
                # semantics mid-trajectory) — the chain-12 full-sum
                # quench burned ~7 min of chip stepping NaNs after its
                # t~1.8 wall. The history up to here is valid dynamics
                # (read_corr_csv trims the rest).
                print(f"# non-finite state at t={row['t']:.4f} "
                      f"(step {it + 1}) — halting the trajectory",
                      flush=True)
                break
    if corr_file is not None:
        corr_file.close()
    logger.close()
    return params, logger


def main(argv=None):
    from qmcnn_tpu.utils.platform import honor_platform_request
    honor_platform_request()
    from qmcnn_tpu.utils.chip_lock import acquire_chip_lock
    _chip_lock = acquire_chip_lock()  # held until process exit
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--override", action="append", default=[],
                   metavar="section.key=value")
    p.add_argument("--mode", choices=["imag", "real"], default="imag")
    p.add_argument("--dt", type=float, default=0.01)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--solver", choices=["dense", "minsr"], default="minsr")
    p.add_argument("--diag-shift", type=float, default=1e-4)
    p.add_argument("--integrator", choices=["euler", "heun"], default="heun")
    p.add_argument("--sampling", choices=["fullsum", "mc"], default="fullsum")
    p.add_argument("--init-from", help="checkpoint dir for the initial state")
    p.add_argument("--init-zero", action="store_true",
                   help="zero all params: the |+x>^N product state")
    p.add_argument("--init-perturb", type=float, default=1e-3,
                   help="gaussian scale added to --init-zero params "
                        "(0 = exact zeros; those are a dead TDVP point "
                        "for conv+lncosh models)")
    p.add_argument("--sector", choices=["auto", "sz0", "free"],
                   default="auto", help="fullsum basis sector")
    p.add_argument("--csv", dest="csv_path")
    p.add_argument("--corr-csv", dest="corr_csv",
                   help="also log the full equal-time C(r, t) correlation "
                        "function to this CSV (FFT -> S(q, t): light-cone "
                        "spreading / order melting after a quench)")
    p.add_argument("--log-every", type=int, default=1)
    args = p.parse_args(argv)
    cfg = cfglib.load(args.config, tuple(args.override))
    print(f"=== evolve {cfg.name}: mode={args.mode} dt={args.dt} "
          f"steps={args.steps} sampling={args.sampling} ===")
    evolve(cfg, mode=args.mode, dt=args.dt, n_steps=args.steps,
           solver=args.solver, diag_shift=args.diag_shift,
           integrator=args.integrator, sampling=args.sampling,
           init_from=args.init_from, init_zero=args.init_zero,
           init_perturb=args.init_perturb,
           sector=args.sector, csv_path=args.csv_path,
           log_every=args.log_every, corr_csv=args.corr_csv)


if __name__ == "__main__":
    main()
