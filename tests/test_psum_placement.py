"""psum-placement guard (SURVEY.md section 4, 'Distributed' tier, row 2):
golden-jaxpr inspection of the sharded train step.

The numeric n-vs-1-device equality tests (test_distributed.py) catch a
mis-placed collective by value; this test catches it *structurally* and
documents exactly where every collective lives. It traces the shard_map'd
step and asserts the number of psum equations in the jaxpr, per SURVEY.md
section 3.4's device-boundary summary:

  SGD path:  (a) <E> mean (re+im)  (b) variance  (c) gradient pytree
             (d) acceptance rate
  SR/pcg:    the above + per-CG-matvec psums (O-bar, J^T(Jv), means),
             traced ONCE inside the lax.while_loop body.

If a refactor intentionally adds/removes a collective, update the golden
constants here — the point is that it can never happen silently.
"""
import jax
import jax.numpy as jnp
import optax

from qmcnn_tpu.lattice import chain
from qmcnn_tpu.models.cnn import LogPsiCNN, log_psi_apply
from qmcnn_tpu.ops.hamiltonians import TFIM
from qmcnn_tpu.parallel.mesh import walker_mesh, make_sharded_vmc
from qmcnn_tpu.sr import SR
from qmcnn_tpu.vmc import VMC

N = 8
M = 64


def _build(sr=None):
    lat = chain(N)
    ham = TFIM(lat, h=1.0)
    model = LogPsiCNN(lattice_shape=(N,), channels=(4,), param_scale=0.1)

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    params = model.init(jax.random.key(0), jnp.ones((1, N), jnp.float32))
    from qmcnn_tpu.sampler.metropolis import MetropolisSampler

    sampler = MetropolisSampler(log_psi_fn, n_sites=N, move="flip")
    vmc = VMC(log_psi_fn=log_psi_fn, ham=ham, sampler=sampler,
              optimizer=optax.sgd(0.02), n_sweeps=1, sr=sr, axis_name="dp")
    return vmc, params


def _psum_eqn_count(jaxpr) -> int:
    """Count psum equations recursively through sub-jaxprs (scan/while/cond
    bodies), so collectives inside the CG while_loop are counted once per
    *trace site*, independent of iteration count."""
    count = 0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "psum_invariant" or \
                eqn.primitive.name.startswith("psum"):
            count += 1
        for v in eqn.params.values():
            for sub in jax.core.jaxprs_in_params({"p": v}):
                count += _psum_eqn_count(sub)
    return count


def _step_jaxpr(sr=None):
    mesh = walker_mesh(8)
    vmc, params = _build(sr=sr)
    sharded = make_sharded_vmc(
        vmc, mesh, state_template=vmc.init_state(jax.random.key(1), M,
                                                 params))
    state = sharded.init_state(jax.random.key(1), M, params)
    return jax.make_jaxpr(sharded._step_fn)(state, jax.random.key(2))


def test_psums_present_and_counted_sgd(eight_devices):
    jaxpr = _step_jaxpr(sr=None)
    n = _psum_eqn_count(jaxpr.jaxpr)
    # (a) e_mean re+im = 2, (b) variance = 1, (c) grad pytree (leaves fused
    # into psum eqns by tree_map — one eqn per leaf batch) and (d) acceptance.
    # The exact number is a golden constant; what must NEVER change silently:
    assert n > 0, "sharded step lost all collectives"
    assert n == GOLDEN_SGD, (
        f"psum count changed: {n} != {GOLDEN_SGD}. If intentional, update "
        "the golden constant and SURVEY.md section 3.4.")


def test_psums_present_and_counted_sr_pcg(eight_devices):
    sr = SR(solver="pcg", cg_maxiter=8)
    jaxpr = _step_jaxpr(sr=sr)
    n = _psum_eqn_count(jaxpr.jaxpr)
    assert n > GOLDEN_SGD, "SR path must add collectives (CG matvec pmeans)"
    assert n == GOLDEN_SR_PCG, (
        f"psum count changed: {n} != {GOLDEN_SR_PCG}. If intentional, "
        "update the golden constant and SURVEY.md section 3.4.")


def _measure_goldens():  # pragma: no cover - helper for updating constants
    print("sgd:", _psum_eqn_count(_step_jaxpr(sr=None).jaxpr))
    print("pcg:", _psum_eqn_count(
        _step_jaxpr(sr=SR(solver="pcg", cg_maxiter=8)).jaxpr))


# Golden constants, measured with _measure_goldens on jax 0.9.0:
#   SGD = 6:  e_mean (re, im) + variance + acceptance + grad-pytree psums
#   pcg = 11: + the CG-matvec collectives (J^T(Jv) tree-psum and the
#             centered-mean scalars), each counted once at its trace site
#             inside the lax.while_loop body.
GOLDEN_SGD = 6
GOLDEN_SR_PCG = 11
