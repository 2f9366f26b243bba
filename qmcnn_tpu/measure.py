"""Measurement entry point: observables from a trained checkpoint.

  python -m qmcnn_tpu.measure --config configs/heis10x10_sr.yaml \
      --ckpt-dir /path/to/ckpts [--sweeps-between 2] [--n-samples 20]

Loads the latest checkpoint, re-thermalizes briefly, then alternates
sampling and measuring: energy (with binned error bars), magnetization,
staggered magnetization squared, S^z-S^z correlation function and its
structure factor (SURVEY.md R5-R7 measurement layer + ops/observables.py).
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from qmcnn_tpu import configs as cfglib
from qmcnn_tpu.builder import build_sharded
from qmcnn_tpu.ops import observables
from qmcnn_tpu.ops.local_energy import local_energy
from qmcnn_tpu.utils.checkpoint import CheckpointManager
from qmcnn_tpu.utils.metrics import binned_stderr


def parse_region(spec: str, n_sites: int) -> np.ndarray:
    """Region spec -> [N] 0/1 float mask: 'half' (first N/2 sites),
    'a:b' (site slice), or a comma list of site indices."""
    mask = np.zeros(n_sites, np.float32)
    if spec == "half":
        mask[: n_sites // 2] = 1.0
    elif ":" in spec:
        lo, hi = spec.split(":")
        mask[int(lo or 0): int(hi or n_sites)] = 1.0
    else:
        mask[[int(t) for t in spec.split(",")]] = 1.0
    if not 0 < mask.sum() < n_sites:
        raise ValueError(f"region {spec!r} must be a proper subset of "
                         f"the {n_sites} sites")
    return mask


def measure(cfg, ckpt_dir: str, n_samples: int = 20,
            sweeps_between: int = 2, therm_sweeps: int = 20,
            fidelity_ckpt: str | None = None,
            fidelity_step: int | None = None,
            lanczos: bool = False,
            total_spin: bool = False,
            dimer: bool = False,
            renyi2_region=None,
            chirality: bool = False,
            sma: bool = False,
            use_ema: bool = False,
            sector_momentum=None):
    measuring_ema = use_ema  # what the report records, however loaded
    # Measurement runs in f32 even when the training config computes in
    # bf16: estimators built from amplitude RATIOS tolerate bf16, but the
    # Lanczos third moment k3 = h3 - 3 h1 h2 + 2 h1^3 cancels ~|E|^3 down
    # to O(var) and bf16 log-psi noise destroys it — observed on the 8x8
    # bf16 hero (lanczos "gain" -0.52/site, violating the single-Krylov
    # bound |gain| <= sqrt(k2) ~ 0.005/site). Params are stored f32; this
    # only changes activation compute, i.e. a measurement-time precision
    # upgrade of the same state.
    if cfg.model.compute_dtype not in (None, "float32"):
        import dataclasses as _dc

        print(f"measure: forcing compute_dtype float32 "
              f"(training used {cfg.model.compute_dtype})")
        cfg = _dc.replace(cfg, model=_dc.replace(cfg.model,
                                                 compute_dtype="float32"))
    sharded, params, lattice = build_sharded(cfg)
    vmc = sharded.vmc
    # with parallel tempering only the beta=1 replica is |psi|^2-distributed
    phys = vmc.sampler.physical
    key = jax.random.key(cfg.run.seed + 12345)
    state = sharded.init_state(jax.random.fold_in(key, 0),
                               cfg.sampler.n_walkers, params)
    if ckpt_dir.endswith(".npz"):
        # durable .params.npz snapshot (utils/transfer): params-only by
        # construction — skip the Orbax manager (whose constructor would
        # try to mkdir the file path) and re-thermalize fresh walkers.
        from qmcnn_tpu.utils.transfer import warm_start

        params = warm_start(params, ckpt_dir,
                            field="ema" if use_ema else "params")
        state = sharded.init_state(jax.random.fold_in(key, 0),
                                   cfg.sampler.n_walkers, params)
        therm_sweeps = max(therm_sweeps, 50)
        use_ema = False
        loaded_step = None
        mgr = None
    else:
        mgr = CheckpointManager(ckpt_dir)
        loaded_step = mgr.latest_step()
    try:
        if mgr is not None:
            state = mgr.restore(state)
            loaded_step = int(state.step)
            print(f"restored checkpoint at step {loaded_step}")
    except (ValueError, KeyError, TypeError) as exc:
        # structure/shape mismatch vs the saved run (e.g. different walker
        # count) — degrade to params-only. Transient I/O errors
        # (OSError etc.) propagate: retrying beats silently measuring a
        # fresh state.
        print(f"full-state restore failed ({type(exc).__name__}); "
              "restoring params only and re-thermalizing fresh walkers")
        from qmcnn_tpu.utils.transfer import warm_start

        params = warm_start(params, ckpt_dir,
                            field="ema" if use_ema else "params")
        state = sharded.init_state(jax.random.fold_in(key, 0),
                                   cfg.sampler.n_walkers, params)
        therm_sweeps = max(therm_sweeps, 50)
        use_ema = False  # already loaded the averaged leaves as params
    if use_ema:
        # evaluate the Polyak average instead of the last iterate; the
        # thermalize below refreshes every cached log-amplitude, so the
        # swap is complete (all estimators read state.params)
        if state.ema is None:
            raise ValueError(
                "--ema: checkpoint/config has no EMA state (train with "
                "optimizer.ema_decay > 0)")
        state = state._replace(params=state.ema)
        print("measuring the EMA (Polyak-averaged) parameters")
    # bounded thermalization dispatches (run.therm_sweeps_per_dispatch):
    # the params-only-restore fallback forces >= 50 fresh sweeps, which on
    # 256+ site deep-model checkpoints exceeds the tunnel's ~80s dispatch
    # kill in one device call — the same failure train() chunks against
    from qmcnn_tpu.train import chunked_thermalize

    state = chunked_thermalize(sharded, state, jax.random.fold_in(key, 1),
                               therm_sweeps,
                               cfg.run.therm_sweeps_per_dispatch)

    n = lattice.n_sites
    # reuse the training auto-chunk (builder/auto_chunk_size) for every
    # measurement forward: a checkpoint whose train step needed chunking
    # (e.g. deep GCNN at M=2048 on 8x8 — 70 GB unchunked, observed) would
    # otherwise OOM the moment it is measured. Adjust to divide the global
    # walker count (train chunks per shard; measure jits over the full M).
    m_walkers = cfg.sampler.n_walkers
    le_chunk = vmc.chunk_size
    if le_chunk is not None:
        le_chunk = max(1, min(le_chunk, m_walkers))
        while m_walkers % le_chunk:
            le_chunk -= 1
        if le_chunk >= m_walkers:
            le_chunk = None
    # forward-batch budget the train step is known to fit: chunk * K
    fwd_budget = (le_chunk or m_walkers) * max(1, vmc.ham.n_conn)
    e_trace, m_trace, mst_trace, ss_trace = [], [], [], []
    mst4_trace = []
    # on a 1-site basis corr is C(r) [n_sites]; with a basis it is the
    # sublattice-resolved C_ab(r) flattened to [basis^2 * n_cells]
    on_grid = lattice.basis == 1
    corr_acc = np.zeros(n if on_grid else lattice.basis * n)
    dimer_acc = np.zeros(n)
    dimer_mean_trace = []
    if dimer and not (on_grid and lattice.ndim == 2):
        raise ValueError("--dimer needs a 2D 1-site-basis lattice")
    # the trained state lives in the Marshall-rotated basis for these
    # kinds: every transverse (off-diagonal) estimator must undo the sign
    marshall_basis = (cfg.hamiltonian.kind in ("heisenberg", "j1j2")
                      and cfg.hamiltonian.marshall)
    nn_disp = None
    if on_grid:
        # full S_i.S_{i+r} at the nearest-neighbor displacement (the bond
        # energy per bond direction; costs N forwards/walker, so just NN
        # here — observables.spin_spin_correlation does any r on demand)
        nn_disp = int(np.ravel_multi_index(
            tuple([1] + [0] * (lattice.ndim - 1)), lattice.shape))

    regions = None
    if renyi2_region:
        # one spec or a list of specs (repeated --renyi2): all regions are
        # evaluated in ONE jitted pass per sample — an entanglement-
        # scaling scan costs len(regions) swap forwards, not recompiles
        specs = ([renyi2_region] if isinstance(renyi2_region, str)
                 else list(renyi2_region))
        regions = jnp.stack([jnp.asarray(parse_region(sp, n))
                             for sp in specs])
        # exchange-family moves keep walkers in one S^z sector; the swap
        # estimator must then mask mismatched-region pairs (see
        # observables.renyi2_swap docstring)
        sector_mask = cfg.sampler.move.startswith("exchange") or (
            getattr(cfg.sampler, "kind", "metropolis") == "direct"
            and cfg.model.kind == "arnn")

        @jax.jit
        def renyi2_once(state):
            # pair even/odd walkers: independent chains by construction
            w = phys(state.walkers)
            s, lp = w.s, w.log_psi
            from qmcnn_tpu.ops.cplx import C as _C
            s1, s2 = s[0::2], s[1::2]
            lp1 = _C(lp.re[0::2], lp.im[0::2])
            lp2 = _C(lp.re[1::2], lp.im[1::2])
            return jnp.stack([observables.renyi2_swap(
                vmc.log_psi_fn, state.params, s1, s2, lp1, lp2, reg,
                sector_mask=sector_mask).re for reg in regions])

    sma_shells, sma_disps = None, None
    sma_ct_acc = None
    if sma:
        from qmcnn_tpu.ops import sma as sma_mod

        # raises early (before any sampling) for non-exchange
        # Hamiltonians, multi-site bases, or open boundaries
        sma_shells = sma_mod.exchange_shells(vmc.ham, lattice)
        sma_disps = sorted({d for _, d in sma_shells})
        sma_ct_acc = np.zeros(len(sma_disps))

        @jax.jit
        def sma_once(state):
            # C_t(delta) per shell displacement: one amplitude-ratio pass
            # each (the same machinery as the NN spin-spin estimator)
            w = phys(state.walkers)
            return jnp.stack([observables.offdiag_observable(
                vmc.log_psi_fn, state.params, w.s, w.log_psi,
                observables.spin_spin_connected(
                    lattice, d, marshall=marshall_basis),
                chunk_size=le_chunk).re for d in sma_disps])

    swap_trace = []
    chi_trace = []
    if chirality:
        lattice.triangles  # raises early on triangle-free geometries

        @jax.jit
        def chirality_once(state):
            w = phys(state.walkers)
            return observables.scalar_chirality(
                vmc.log_psi_fn, state.params, w.s, w.log_psi, lattice,
                chunk_size=le_chunk)


    @jax.jit
    def measure_once(state):
        walkers = phys(state.walkers)
        e = local_energy(vmc.log_psi_fn, state.params, vmc.ham, walkers.s,
                         walkers.log_psi, chunk_size=le_chunk)
        if on_grid:
            ss_nn = observables.spin_spin_correlation(
                vmc.log_psi_fn, state.params, walkers.s, walkers.log_psi,
                lattice, nn_disp, marshall=marshall_basis,
                chunk_size=le_chunk).re
            corr = observables.szsz_correlation(walkers.s, lattice)
        else:
            ss_nn = jnp.zeros(())
            corr = observables.szsz_correlation_basis(
                walkers.s, lattice).reshape(-1)
        if dimer:
            dcorr, dmean = observables.dimer_correlation(walkers.s, lattice)
        else:
            dcorr, dmean = jnp.zeros((n,)), jnp.zeros(())
        mst2, mst4 = observables.staggered_moments(walkers.s, lattice)
        return (e.mean().re,
                observables.magnetization(walkers.s),
                mst2, mst4,
                corr, ss_nn, dcorr, dmean)

    sec_num, sec_den = [], []
    if sector_momentum is not None:
        # momentum-sector energy by RATIO estimators under |psi|^2 — the
        # estimator the r4 (pi,pi) refutation named as the fix for the
        # diverging |P psi|^2-sampled optimization (ops/observables.
        # sector_energy_ratio). Cost: (K+1) x T forwards per walker, so
        # scale the chunk down by the translation count T.
        t_trans = int(np.prod(lattice.shape))
        m_w = cfg.sampler.n_walkers
        sec_chunk = max(1, (le_chunk or m_w) // t_trans)
        while m_w % sec_chunk:
            sec_chunk -= 1

        def sector_once(state):
            walkers = phys(state.walkers)
            return observables.sector_energy_ratio(
                vmc.log_psi_fn, state.params, walkers.s, walkers.log_psi,
                vmc.ham, tuple(lattice.shape), tuple(sector_momentum),
                chunk_size=sec_chunk)

    lz_e1, lz_g = [], []
    if lanczos:
        from qmcnn_tpu.ops import cplx
        from qmcnn_tpu.ops.lanczos import h_moment_samples

        # chunk so the [chunk * K, N] E_loc-of-connected batch stays
        # bounded — this pass costs K x a normal local-energy pass.
        # Budget from the training-validated forward batch (fwd_budget =
        # train chunk x K), halved: the moment pass keeps e_prime/ratio/
        # s_prime live on top of the forward, and the r2 pipeline's
        # hard-coded 4096-forward budget crashed the TPU worker on the
        # 8x8/10x10 heroes (runs/j1j2_8x8_spring_measure.log).
        k_conn = vmc.ham.n_conn
        m_local = cfg.sampler.n_walkers
        chunk = max(1, min(m_local, fwd_budget // (2 * max(1, k_conn))))
        while m_local % chunk:
            chunk -= 1

        # One DISPATCH per walker chunk (host loop), not one jit with an
        # internal lax.map over all of M: the moment pass costs K x a
        # normal E_loc pass, so a full-M dispatch runs minutes on the
        # deep heroes and the tunneled TPU kills dispatches over ~80 s
        # (docs/GUIDE.md; the r2 pipeline measure crashes).
        @jax.jit
        def lanczos_chunk_fn(params, s_c, lp_re, lp_im):
            return h_moment_samples(vmc.log_psi_fn, params, vmc.ham,
                                    s_c, cplx.C(lp_re, lp_im),
                                    chunk_size=None)

        def lanczos_once(state):
            w = phys(state.walkers)
            e_re, e_im, g_re, g_im = [], [], [], []
            for lo in range(0, m_local, chunk):
                e1_c, g_c = lanczos_chunk_fn(
                    state.params, w.s[lo:lo + chunk],
                    w.log_psi.re[lo:lo + chunk],
                    w.log_psi.im[lo:lo + chunk])
                e_re.append(np.asarray(e1_c.re))
                e_im.append(np.asarray(e1_c.im))
                g_re.append(np.asarray(g_c.re))
                g_im.append(np.asarray(g_c.im))
            return (np.concatenate(e_re) + 1j * np.concatenate(e_im),
                    np.concatenate(g_re) + 1j * np.concatenate(g_im))

    for i in range(n_samples):
        state = sharded.thermalize(state, jax.random.fold_in(key, 100 + i),
                                   n_sweeps=sweeps_between)
        e, m, mst, mst4, corr, ss_nn, dcorr, dmean = measure_once(state)
        e_trace.append(float(e))
        m_trace.append(float(m))
        mst_trace.append(float(mst))
        mst4_trace.append(float(mst4))
        ss_trace.append(float(ss_nn))
        corr_acc += np.asarray(corr)
        dimer_acc += np.asarray(dcorr)
        dimer_mean_trace.append(float(dmean))
        if lanczos:
            e1_i, g_i = lanczos_once(state)
            lz_e1.append(e1_i)
            lz_g.append(g_i)
        if sector_momentum is not None:
            num_i, den_i = sector_once(state)
            sec_num.append(np.asarray(num_i.re, np.float64)
                           + 1j * np.asarray(num_i.im, np.float64))
            sec_den.append(np.asarray(den_i.re, np.float64)
                           + 1j * np.asarray(den_i.im, np.float64))
        if regions is not None:
            swap_trace.append(np.asarray(renyi2_once(state)))
        if chirality:
            chi_trace.append(float(chirality_once(state).re))
        if sma:
            sma_ct_acc += np.asarray(sma_once(state))

    s2 = None
    if total_spin:
        # SU(2) Casimir <S^2>: singlet 0, triplet 2, ... — the sharpest
        # check of what sector a state (e.g. a penalty-trained excited
        # state) actually lives in. Costs N(N-1)/2 forwards per walker,
        # so it is opt-in and measured once on the final walker set.
        s2_out = jax.jit(lambda st: observables.total_spin_sq(
            vmc.log_psi_fn, st.params, phys(st.walkers).s,
            phys(st.walkers).log_psi,
            lattice, marshall=marshall_basis,
            pair_chunk=max(1, fwd_budget // m_walkers)))(state)
        s2 = float(s2_out.re)

    fid = None
    if fidelity_ckpt is not None:
        # MC fidelity |<psi1|psi2>|^2/(<1|1><2|2>) vs another checkpoint of
        # the same model family (ops/fidelity.py; two-chain estimator —
        # chain 2 re-thermalizes under params2)
        from qmcnn_tpu.ops.fidelity import fidelity as mc_fidelity
        from qmcnn_tpu.utils.transfer import warm_start

        params2 = warm_start(
            jax.tree_util.tree_map(lambda x: x, state.params), fidelity_ckpt,
            step=fidelity_step)
        state2 = sharded.init_state(jax.random.fold_in(key, 2),
                                    cfg.sampler.n_walkers, params2)
        state2 = chunked_thermalize(sharded, state2,
                                    jax.random.fold_in(key, 3),
                                    max(therm_sweeps, 50),
                                    cfg.run.therm_sweeps_per_dispatch)
        fid = float(jax.jit(mc_fidelity, static_argnums=(0, 2))(
            vmc.log_psi_fn, state.params, vmc.log_psi_fn, params2,
            phys(state.walkers).s, phys(state2.walkers).s))

    corr = corr_acc / n_samples
    report = {
        "step": int(loaded_step) if loaded_step is not None else 0,
        "ema": bool(measuring_ema),
        "energy": float(np.mean(e_trace)),
        "energy_err": binned_stderr(np.asarray(e_trace)),
        "energy_per_site": float(np.mean(e_trace)) / n,
        "magnetization": float(np.mean(m_trace)),
        "staggered_m2": float(np.mean(mst_trace)),
        "staggered_m4": float(np.mean(mst4_trace)),
        "binder_cumulant": observables.binder_cumulant(
            float(np.mean(mst_trace)), float(np.mean(mst4_trace))),
        "szsz_corr": corr.tolist(),
    }
    if on_grid:
        sq = observables.structure_factor(corr, lattice)
        report["spin_spin_nn"] = float(np.mean(ss_trace))
        report["structure_factor_peak"] = float(sq.max())
        report["structure_factor_peak_q_index"] = int(sq.argmax())
        report["correlation_length"] = observables.correlation_length(
            corr, lattice)
    else:
        # szsz_corr holds the sublattice-resolved C_ab(r) flattened from
        # [basis, basis, n_cells]
        sq = observables.structure_factor_basis(corr, lattice)
        report["structure_factor_peak"] = float(sq.max())
        report["structure_factor_peak_q_index"] = int(sq.argmax())
        if lattice.is_bipartite_compatible:
            # bipartite BY BASIS (honeycomb): the Neel order parameter is
            # basis-staggered and peaks at q = 0
            sq_st = observables.structure_factor_basis(
                corr, lattice, phases=(-1.0) ** np.arange(lattice.basis))
            report["neel_sf_q0"] = float(sq_st.reshape(-1)[0])
    if dimer:
        d_mean = float(np.mean(dimer_mean_trace))
        sd = observables.dimer_structure_factor(
            dimer_acc / n_samples, d_mean, lattice)
        report["dimer_mean"] = d_mean
        # columnar VBS (x-bonds) peaks at q = (pi, 0) = index [Lx/2, 0]
        report["dimer_sf_pi0"] = float(sd[lattice.shape[0] // 2, 0])
        report["dimer_sf_peak"] = float(sd.max())
        report["dimer_sf_peak_q_index"] = int(sd.argmax())
    if regions is not None:
        # average the Tr(rho_A^2) estimates, THEN -ln (log of the mean;
        # mean-of-logs is biased for a noisy positive estimator)
        traces = np.stack(swap_trace)                     # [samples, R]
        means = traces.mean(axis=0)
        report["renyi2_swap_mean"] = [float(x) for x in means]
        report["renyi2_swap_err"] = [binned_stderr(traces[:, r])
                                     for r in range(traces.shape[1])]
        report["renyi2_entropy"] = [observables.renyi2_entropy(float(x))
                                    for x in means]
        report["renyi2_region_size"] = [int(r.sum())
                                        for r in np.asarray(regions)]
        if len(means) == 1:  # single-region back-compat: plain scalars
            for k in ("renyi2_swap_mean", "renyi2_swap_err",
                      "renyi2_entropy", "renyi2_region_size"):
                report[k] = report[k][0]
    if chirality:
        report["scalar_chirality"] = float(np.mean(chi_trace))
        report["scalar_chirality_err"] = binned_stderr(np.asarray(chi_trace))
    if sma:
        from qmcnn_tpu.ops import sma as sma_mod

        ct = {d: float(v / n_samples)
              for d, v in zip(sma_disps, sma_ct_acc)}
        f_q, s_q, omega = sma_mod.sma_dispersion(sma_shells, ct, corr,
                                                 lattice)
        finite = np.isfinite(omega) & (np.arange(n).reshape(omega.shape) > 0)
        report["sma_transverse_corr"] = {str(d): ct[d] for d in sma_disps}
        report["sma_first_moment"] = [round(float(x), 8)
                                      for x in f_q.reshape(-1)]
        report["sma_omega"] = [float(x) if np.isfinite(x) else None
                               for x in omega.reshape(-1)]
        if finite.any():
            # the softest mode (the magnon-band minimum over the grid,
            # q = 0 excluded) — an upper bound on the spin gap
            k = int(np.nanargmin(np.where(finite, omega, np.nan)))
            report["sma_gap_bound"] = float(omega.reshape(-1)[k])
            report["sma_gap_q_index"] = k
    if sector_momentum is not None:
        from qmcnn_tpu.ops.cplx import C as _C
        from qmcnn_tpu.ops.observables import sector_energy_from_samples

        pooled_n = np.concatenate(sec_num)
        pooled_d = np.concatenate(sec_den)
        e_q, e_q_err, w_q = sector_energy_from_samples(
            _C(pooled_n.real, pooled_n.imag),
            _C(pooled_d.real, pooled_d.imag))
        e0_mean = float(np.mean(e_trace))
        report["sector_momentum"] = [int(x) for x in sector_momentum]
        report["sector_energy"] = e_q
        report["sector_energy_err"] = e_q_err
        report["sector_weight"] = w_q  # |<psi|P_q|psi>| — small weight =>
        # amplified variance; read the error bar, not just the mean
        report["sector_gap"] = e_q - e0_mean  # vs <H> of the same state;
        # cross-check against sma_gap_bound at the same q (--sma)
    if fid is not None:
        report["fidelity_vs_ckpt"] = fid
    if s2 is not None:
        report["total_spin_sq"] = s2
    if lanczos:
        from qmcnn_tpu.ops import cplx
        from qmcnn_tpu.ops.lanczos import lanczos_step, moments_from_samples

        e1 = np.concatenate(lz_e1)
        g = np.concatenate(lz_g)
        h1, h2, h3 = moments_from_samples(
            cplx.C(e1.real.astype(np.float64), e1.imag.astype(np.float64)),
            cplx.C(g.real.astype(np.float64), g.imag.astype(np.float64)))
        alpha, e_lz, _ = lanczos_step(h1, h2, h3)
        # validity guard: one Krylov step can lower the energy by at most
        # sqrt(k2) (the 2x2 tridiagonal's min eigenvalue is >= h1 -
        # sqrt(k2)); a bigger "gain" means the moment estimators are
        # noise-dominated (k3's ~|E|^3 cancellation) — report it as such
        # instead of an impossible energy
        k2 = h2 - h1 * h1
        bound = np.sqrt(max(k2, 0.0))
        valid = bool(h1 - e_lz <= 1.05 * bound + 1e-12)
        report["lanczos_valid"] = valid
        report["lanczos_alpha"] = alpha
        report["lanczos_energy"] = e_lz
        report["lanczos_energy_per_site"] = e_lz / n
        report["lanczos_gain_per_site"] = (e_lz - report["energy"]) / n
        # moment MC noise, quantified (VERDICT r4 weak #6: the arm-I
        # 1.48% row shipped without an error bar): delete-one-block
        # jackknife over the independent walker snapshots, propagated
        # through the full nonlinear moments -> (alpha, E_lz) map
        blocks = len(lz_e1)
        if blocks >= 4:
            e_js = []
            for j in range(blocks):
                e1_j = np.concatenate(
                    [x for i, x in enumerate(lz_e1) if i != j])
                g_j = np.concatenate(
                    [x for i, x in enumerate(lz_g) if i != j])
                h1j, h2j, h3j = moments_from_samples(
                    cplx.C(e1_j.real.astype(np.float64),
                           e1_j.imag.astype(np.float64)),
                    cplx.C(g_j.real.astype(np.float64),
                           g_j.imag.astype(np.float64)))
                _, e_j, _ = lanczos_step(h1j, h2j, h3j)
                e_js.append(e_j)
            e_js = np.asarray(e_js, np.float64)
            err = np.sqrt((blocks - 1) / blocks
                          * ((e_js - e_js.mean()) ** 2).sum())
            report["lanczos_energy_err"] = float(err)
            report["lanczos_energy_per_site_err"] = float(err) / n
        if not valid:
            print(f"lanczos: NOISE-DOMINATED (gain {h1 - e_lz:.3g} > "
                  f"sqrt(k2) {bound:.3g}); increase samples/walkers or "
                  "check moment precision")
    return report


def main(argv=None):
    from qmcnn_tpu.utils.platform import honor_platform_request
    honor_platform_request()
    from qmcnn_tpu.utils.chip_lock import acquire_chip_lock
    _chip_lock = acquire_chip_lock()  # held until process exit
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--n-samples", type=int, default=20)
    p.add_argument("--sweeps-between", type=int, default=2)
    p.add_argument("--fidelity-ckpt", default=None,
                   help="second checkpoint dir: report the MC fidelity "
                        "|<psi1|psi2>|^2 between the two states")
    p.add_argument("--fidelity-step", type=int, default=None)
    p.add_argument("--lanczos-step", action="store_true",
                   help="also report the Lanczos-step refined variational "
                        "energy of (1 + alpha H) psi (ops/lanczos.py; "
                        "costs K extra local-energy passes per sample). "
                        "A diagnostic for under-converged states: on "
                        "converged heroes the moment noise at affordable "
                        "budgets swamps the gain and the validity guard "
                        "refuses (BASELINE.md 2026-08-19)")
    p.add_argument("--total-spin", action="store_true",
                   help="also report <S^2> of the total spin (singlet 0, "
                        "triplet 2, ...; costs N(N-1)/2 forwards/walker)")
    p.add_argument("--dimer", action="store_true",
                   help="also report z-dimer correlations + structure "
                        "factor (VBS order probe; 2D square lattices)")
    p.add_argument("--chirality", action="store_true",
                   help="also report the scalar spin chirality "
                        "<S_i.(S_j x S_k)> averaged over CCW triangles "
                        "(triangular/kagome; chiral-order diagnostic)")
    p.add_argument("--sma", action="store_true",
                   help="also report the single-mode-approximation "
                        "(Feynman) magnon dispersion omega_SMA(q) = "
                        "f(q)/S(q) over the reciprocal grid, plus the "
                        "softest-mode spin-gap bound (exchange "
                        "Hamiltonians on 1-site-basis periodic lattices; "
                        "costs one amplitude-ratio pass per bond shell)")
    p.add_argument("--renyi2", action="append", default=None,
                   metavar="REGION",
                   help="also report the Renyi-2 entanglement entropy of a "
                        "region via the replica swap trick: 'half', a site "
                        "slice 'a:b', or a comma list of sites; repeat the "
                        "flag for an entanglement-scaling scan (all "
                        "regions measured in one pass)")
    p.add_argument("--sector-momentum", default=None,
                   help="comma-separated integer wavenumbers m_d (q_d = "
                        "2 pi m_d / L_d), e.g. '4,4' for (pi,pi) on 8x8: "
                        "momentum-sector energy by |psi|^2 ratio "
                        "estimators (no |P psi|^2 sampling)")
    p.add_argument("--ema", action="store_true",
                   help="measure the Polyak/EMA-averaged parameters saved "
                        "by an optimizer.ema_decay run instead of the last "
                        "iterate (averages out per-step MC gradient noise)")
    p.add_argument("--override", action="append", default=[])
    args = p.parse_args(argv)
    cfg = cfglib.load(args.config, tuple(args.override))
    report = measure(cfg, args.ckpt_dir, n_samples=args.n_samples,
                     sweeps_between=args.sweeps_between,
                     fidelity_ckpt=args.fidelity_ckpt,
                     fidelity_step=args.fidelity_step,
                     lanczos=args.lanczos_step,
                     total_spin=args.total_spin,
                     dimer=args.dimer,
                     renyi2_region=args.renyi2,
                     chirality=args.chirality,
                     sma=args.sma,
                     use_ema=args.ema,
                     sector_momentum=(
                         [int(x) for x in args.sector_momentum.split(",")]
                         if args.sector_momentum else None))
    print(json.dumps({k: v for k, v in report.items() if k != "szsz_corr"},
                     indent=2))
    print("szsz_corr:", np.array2string(np.asarray(report["szsz_corr"]),
                                        precision=4))


if __name__ == "__main__":
    main()
