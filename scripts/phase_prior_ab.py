"""A/B: frustrated-lattice Heisenberg AF, small complex CNN + minSR,
with vs without the sublattice_120 phase prior (models/phase.py).
Defaults to kagome 2x3 (18 sites); pass a geometry + shape to switch,
e.g. `... phase_prior_ab.py 800 triangular 6 3`.

Context: BASELINE.md records a ~10.3% plateau for this recipe (the
hardest sign structure in the suite; the plain uniform init sits on the
polarized +n_bonds/4 saddle). The 120-degree prior is the Huse-Elser
sign-structure cure — this probe measures what it buys at matched
step counts. CPU-friendly (18 sites, M=256).

Usage: JAX_PLATFORMS=cpu python scripts/phase_prior_ab.py \
           [n_steps] [geometry] [Lx] [Ly]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from qmcnn_tpu.builder import build
from qmcnn_tpu.configs import from_yaml
from qmcnn_tpu.ops import exact

N_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 800
GEOMETRY = sys.argv[2] if len(sys.argv) > 2 else "kagome"
LX = int(sys.argv[3]) if len(sys.argv) > 3 else 2
LY = int(sys.argv[4]) if len(sys.argv) > 4 else 3


def cfg_yaml(phase_bias, param_scale):
    extra = f", phase_bias: {phase_bias}" if phase_bias else ""
    return from_yaml(f"""
name: phase_ab
lattice: {{shape: [{LX}, {LY}], geometry: {GEOMETRY}}}
model: {{kind: cnn, channels: [12, 12], complex_params: true,
        param_scale: {param_scale}{extra}}}
hamiltonian: {{kind: heisenberg, marshall: false}}
sampler: {{n_walkers: 256, move: exchange_anti, n_therm_sweeps: 20}}
optimizer: {{kind: sgd, lr: 0.05, schedule: cosine}}
sr: {{enabled: true, solver: minsr, diag_shift0: 0.1,
     diag_shift_decay: 0.97, diag_shift_min: 0.01}}
run: {{n_steps: {N_STEPS}, seed: 0}}
""")


def run(cfg, e_ed):
    vmc, params, lattice = build(cfg)
    state = vmc.init_state(jax.random.key(0), cfg.sampler.n_walkers, params)
    ids = jnp.arange(cfg.sampler.n_walkers)
    state = vmc.thermalize(state, jax.random.key(1), ids, 20)
    chunk = max(N_STEPS // 8, 1)
    step = jax.jit(lambda st, k: vmc.run_steps(st, k, ids, chunk))
    tail = []
    for i in range(8):
        state, metrics = step(state, jax.random.key(100 + i))
        e = np.asarray(metrics.energy_re)
        print(f"  steps {(i + 1) * chunk:5d}: E = {e[-1]:+.4f} "
              f"(rel {abs(e[-1] - e_ed) / abs(e_ed):.4f})", flush=True)
        tail.append(e)
    e_tail = float(np.concatenate(tail[-2:]).mean())
    return e_tail, abs(e_tail - e_ed) / abs(e_ed)


def main():
    probe = cfg_yaml(None, 0.05)
    _, _, lattice = build(probe)
    e_ed = exact.ground_energy(
        exact.sparse_heisenberg(lattice.n_sites, lattice.nn_bonds))
    print(f"ED ground energy ({lattice.n_sites} sites): {e_ed:+.6f}")
    results = {}
    for label, pb, scale in (("plain", None, 0.05),
                             ("120-prior", "sublattice_120", 0.05)):
        print(f"[{label}] param_scale={scale}")
        e, rel = run(cfg_yaml(pb, scale), e_ed)
        print(f"[{label}] tail E = {e:+.5f}  rel err = {rel:.4f}")
        results[label] = (e, rel)
    print("\nsummary:", {k: f"{v[1]:.4f}" for k, v in results.items()})


if __name__ == "__main__":
    main()
