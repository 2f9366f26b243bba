"""SR tests (SURVEY.md section 4): matrix-free S matvec vs a densely
materialized S on a small net, CG vs np.linalg.solve, and the shift
schedule."""
import dataclasses

import pytest

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from qmcnn_tpu.models.cnn import LogPsiCNN, log_psi_apply
from qmcnn_tpu.sr import SR, cg, make_s_matvec, tree_dot

N = 6
M = 40


def setup(complex_params=True):
    model = LogPsiCNN(lattice_shape=(N,), channels=(3,), param_scale=0.3,
                      complex_params=complex_params)
    v = model.init(jax.random.key(3), jnp.ones((1, N), jnp.float32))

    def log_psi_fn(params, s):
        return log_psi_apply(model, params, s)

    s = (2.0 * jax.random.bernoulli(jax.random.key(0), 0.5, (M, N)) - 1.0
         ).astype(jnp.float32)
    return v, log_psi_fn, s


def dense_s(log_psi_fn, params, s):
    flat, unravel = jax.flatten_util.ravel_pytree(params)

    def f_re(fp, si):
        return log_psi_fn(unravel(fp), si[None, :]).re[0]

    def f_im(fp, si):
        return log_psi_fn(unravel(fp), si[None, :]).im[0]

    j_re = np.asarray(jax.vmap(jax.grad(f_re), (None, 0))(flat, s))
    j_im = np.asarray(jax.vmap(jax.grad(f_im), (None, 0))(flat, s))
    o = j_re + 1j * j_im  # [M, P]
    oc = o - o.mean(axis=0, keepdims=True)
    return np.real(np.conj(oc).T @ oc) / s.shape[0], unravel, flat


@pytest.mark.slow
def test_matvec_matches_dense():
    for complex_params in [False, True]:
        v, log_psi_fn, s = setup(complex_params)
        params = v
        s_dense, unravel, flat = dense_s(log_psi_fn, params, s)
        shift = 0.05
        matvec = make_s_matvec(log_psi_fn, params, s, jnp.asarray(shift))
        rng = np.random.default_rng(1)
        for _ in range(3):
            vec = rng.normal(size=flat.size).astype(np.float32)
            got, _ = jax.flatten_util.ravel_pytree(matvec(unravel(vec)))
            want = (s_dense + shift * np.eye(flat.size)) @ vec
            np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3,
                                       atol=2e-5)


def test_cg_solves_dense_system():
    v, log_psi_fn, s = setup()
    s_dense, unravel, flat = dense_s(log_psi_fn, v, s)
    shift = 0.1
    a = s_dense + shift * np.eye(flat.size)
    rng = np.random.default_rng(2)
    b = rng.normal(size=flat.size).astype(np.float32) * 0.01
    want = np.linalg.solve(a, b)
    matvec = make_s_matvec(log_psi_fn, v, s, jnp.asarray(shift))
    result = cg(matvec, unravel(jnp.asarray(b)), tol=1e-7, maxiter=500)
    got, _ = jax.flatten_util.ravel_pytree(result.x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-3, atol=1e-5)
    assert int(result.iters) > 0
    assert float(result.residual) < 1e-5


def test_cg_pytree_identity():
    """CG on the identity operator returns b in one iteration."""
    b = {"a": jnp.arange(4.0), "b": jnp.ones((2, 3))}
    res = cg(lambda v: v, b, tol=1e-8)
    got, _ = jax.flatten_util.ravel_pytree(res.x)
    want, _ = jax.flatten_util.ravel_pytree(b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
    assert int(res.iters) <= 2


def test_diag_shift_schedule():
    sr = SR(diag_shift0=10.0, diag_shift_decay=0.5, diag_shift_min=0.1)
    np.testing.assert_allclose(float(sr.diag_shift(jnp.asarray(0))), 10.0,
                               rtol=1e-6)
    np.testing.assert_allclose(float(sr.diag_shift(jnp.asarray(2))), 2.5,
                               rtol=1e-6)
    np.testing.assert_allclose(float(sr.diag_shift(jnp.asarray(50))), 0.1,
                               rtol=1e-6)


def test_sr_solve_jits_and_preconditions():
    """(S + lambda) delta = F must hold for the returned delta."""
    v, log_psi_fn, s = setup()
    s_dense, unravel, flat = dense_s(log_psi_fn, v, s)
    rng = np.random.default_rng(3)
    f_vec = rng.normal(size=flat.size).astype(np.float32) * 0.01
    grads = unravel(jnp.asarray(f_vec))
    sr = SR(diag_shift0=0.1, diag_shift_decay=1.0, diag_shift_min=0.1,
            cg_tol=1e-7, cg_maxiter=500)
    solve = jax.jit(lambda p, s_, g, st: sr.solve(log_psi_fn, p, s_, g, st))
    delta, iters, residual = solve(v, s, grads, jnp.asarray(0))
    d, _ = jax.flatten_util.ravel_pytree(delta)
    lhs = (s_dense + 0.1 * np.eye(flat.size)) @ np.asarray(d)
    np.testing.assert_allclose(lhs, f_vec, rtol=5e-3, atol=1e-6)


def test_pcg_and_dense_solvers_match_oracle():
    """All three SR backends must agree with np.linalg.solve."""
    v, log_psi_fn, s = setup()
    s_dense, unravel, flat = dense_s(log_psi_fn, v, s)
    rng = np.random.default_rng(4)
    f_vec = rng.normal(size=flat.size).astype(np.float32) * 0.01
    grads = unravel(jnp.asarray(f_vec))
    shift = 0.1
    want = np.linalg.solve(s_dense + shift * np.eye(flat.size), f_vec)
    for solver in ["cg", "pcg", "dense"]:
        sr = SR(solver=solver, diag_shift0=shift, diag_shift_decay=1.0,
                diag_shift_min=shift, cg_tol=1e-7, cg_maxiter=500)
        delta, iters, res = jax.jit(
            lambda p, s_, g, st: sr.solve(log_psi_fn, p, s_, g, st)
        )(v, s, grads, jnp.asarray(0))
        d, _ = jax.flatten_util.ravel_pytree(delta)
        np.testing.assert_allclose(np.asarray(d), want, rtol=1e-2, atol=1e-5,
                                   err_msg=f"solver={solver}")


def test_jacobian_chunking_matches():
    from qmcnn_tpu.sr import make_jacobian_s

    v, log_psi_fn, s = setup()
    full = make_jacobian_s(log_psi_fn, v, s)
    chunked = make_jacobian_s(log_psi_fn, v, s, chunk_size=8)
    np.testing.assert_allclose(np.asarray(full.oc_re),
                               np.asarray(chunked.oc_re), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(full.diag_s),
                               np.asarray(chunked.diag_s), rtol=1e-5,
                               atol=1e-7)


def test_proportional_shift_runs():
    v, log_psi_fn, s = setup()
    grads = jax.tree_util.tree_map(lambda x: 0.01 * jnp.ones_like(x), v)
    sr = SR(solver="pcg", proportional_shift=True, diag_shift0=0.1,
            diag_shift_decay=1.0, diag_shift_min=0.1)
    delta, iters, res = sr.solve(log_psi_fn, v, s, grads, jnp.asarray(0))
    d, _ = jax.flatten_util.ravel_pytree(delta)
    assert np.all(np.isfinite(np.asarray(d)))


def test_minsr_equals_dense_solution():
    """The sample-space (minSR) solve must equal the P-space solve exactly
    (push-through identity) — using the true F = O~^T eps / M built from
    e_loc residuals."""
    from qmcnn_tpu.ops.cplx import C

    v, log_psi_fn, s = setup()
    s_dense, unravel, flat = dense_s(log_psi_fn, v, s)
    rng = np.random.default_rng(7)
    de_re = rng.normal(size=M).astype(np.float32)
    de_im = rng.normal(size=M).astype(np.float32)
    de_re -= de_re.mean()
    de_im -= de_im.mean()
    e_loc = C(jnp.asarray(de_re), jnp.asarray(de_im))

    # dense O for the exact F
    flatp, unravel2 = jax.flatten_util.ravel_pytree(v)

    def f_re(fp, si):
        return log_psi_fn(unravel2(fp), si[None, :]).re[0]

    def f_im(fp, si):
        return log_psi_fn(unravel2(fp), si[None, :]).im[0]

    j_re = np.asarray(jax.vmap(jax.grad(f_re), (None, 0))(flatp, s))
    j_im = np.asarray(jax.vmap(jax.grad(f_im), (None, 0))(flatp, s))
    f_vec = (j_re.T @ de_re + j_im.T @ de_im) / M
    grads = unravel(jnp.asarray(f_vec.astype(np.float32)))

    shift = 0.1
    want = np.linalg.solve(s_dense + shift * np.eye(flat.size), f_vec)
    sr = SR(solver="minsr", diag_shift0=shift, diag_shift_decay=1.0,
            diag_shift_min=shift)
    delta, iters, resid = jax.jit(
        lambda p, s_, g, st, e: sr.solve(log_psi_fn, p, s_, g, st, e_loc=e)
    )(v, s, grads, jnp.asarray(0), e_loc)
    d, _ = jax.flatten_util.ravel_pytree(delta)
    np.testing.assert_allclose(np.asarray(d), want, rtol=5e-3, atol=1e-5)
    assert float(resid) < 1e-3


def test_minsr_requires_eloc():
    import pytest as _pytest

    v, log_psi_fn, s = setup()
    grads = jax.tree_util.tree_map(lambda x: 0.01 * jnp.ones_like(x), v)
    sr = SR(solver="minsr")
    with _pytest.raises(ValueError):
        sr.solve(log_psi_fn, v, s, grads, jnp.asarray(0))


def test_minsr_distributed_matches_single_device():
    """all-gather minSR over 8 shards == single-device minSR."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from qmcnn_tpu.ops.cplx import C
    from qmcnn_tpu.parallel.mesh import walker_mesh

    v, log_psi_fn, s = setup()
    rng = np.random.default_rng(9)
    de_re = rng.normal(size=M).astype(np.float32)
    de_im = rng.normal(size=M).astype(np.float32)
    e_loc = C(jnp.asarray(de_re), jnp.asarray(de_im))
    grads = jax.tree_util.tree_map(
        lambda x: 0.01 * jnp.ones_like(x), v)
    sr = SR(solver="minsr", diag_shift0=0.1, diag_shift_decay=1.0,
            diag_shift_min=0.1)
    want, _, _ = sr.solve(log_psi_fn, v, s, grads, jnp.asarray(0),
                          e_loc=e_loc)

    mesh = walker_mesh(8)
    grads_spec = jax.tree_util.tree_map(lambda _: P(), grads)
    v_spec = jax.tree_util.tree_map(lambda _: P(), v)

    def local(vv, ss, gg, ee):
        d, it, res = sr.solve(log_psi_fn, vv, ss, gg, jnp.asarray(0),
                              axis_name="dp", e_loc=ee)
        return d

    f = shard_map(
        local, mesh=mesh,
        in_specs=(v_spec, P("dp"), grads_spec, C(P("dp"), P("dp"))),
        out_specs=grads_spec, check_vma=False,
    )
    got = jax.jit(f)(v, s, grads, e_loc)
    wflat, _ = jax.flatten_util.ravel_pytree(want)
    gflat, _ = jax.flatten_util.ravel_pytree(got)
    np.testing.assert_allclose(np.asarray(gflat), np.asarray(wflat),
                               rtol=5e-3, atol=1e-6)


def test_real_log_psi_mode_matches_full_for_all_solvers():
    """For a real-output model, real_log_psi=True (skip the J_im block;
    VERDICT r1 weak item 7) must give the same natural gradient as the
    full computation, for every materializing solver."""
    from qmcnn_tpu.ops.cplx import C

    v, log_psi_fn, s = setup(complex_params=False)
    rng = np.random.default_rng(11)
    de_re = (rng.normal(size=M).astype(np.float32))
    de_re -= de_re.mean()
    e_loc = C(jnp.asarray(de_re), jnp.zeros(M, jnp.float32))

    flatp, unravel2 = jax.flatten_util.ravel_pytree(v)

    def f_re(fp, si):
        return log_psi_fn(unravel2(fp), si[None, :]).re[0]

    j_re = np.asarray(jax.vmap(jax.grad(f_re), (None, 0))(flatp, s))
    f_vec = (j_re.T @ de_re) / M
    grads = unravel2(jnp.asarray(f_vec.astype(np.float32)))

    for solver in ("pcg", "dense", "minsr", "cg"):
        kw = dict(solver=solver, diag_shift0=0.1, diag_shift_decay=1.0,
                  diag_shift_min=0.1, cg_tol=1e-7, cg_maxiter=500)
        d_full, _, _ = SR(real_log_psi=False, **kw).solve(
            log_psi_fn, v, s, grads, jnp.asarray(0), e_loc=e_loc)
        d_real, _, _ = SR(real_log_psi=True, **kw).solve(
            log_psi_fn, v, s, grads, jnp.asarray(0), e_loc=e_loc)
        a, _ = jax.flatten_util.ravel_pytree(d_full)
        b, _ = jax.flatten_util.ravel_pytree(d_real)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6, err_msg=solver)


def test_real_log_psi_minsr_gram_is_m_by_m():
    """The real-mode minSR Gram must be [M, M], not [2M, 2M] — that 4x
    memory cut is the point of the optimization."""
    from qmcnn_tpu.sr import make_jacobian_s

    v, log_psi_fn, s = setup(complex_params=False)
    op = make_jacobian_s(log_psi_fn, v, s, with_im=False)
    assert op.oc_im is None
    assert op.oc_re.shape[0] == M


def test_auto_solver_resolution():
    """solver='auto' picks minSR exactly when the sample-space system is
    the smaller one (parts*M_total <= P), else pcg; concrete names pass
    through untouched."""
    from qmcnn_tpu.sr import resolve_solver

    assert resolve_solver("auto", 512, 10_000, True) == "minsr"
    assert resolve_solver("auto", 512, 10_000, False) == "minsr"  # 1024<=1e4
    assert resolve_solver("auto", 512, 1000, False) == "pcg"      # 1024>1000
    assert resolve_solver("auto", 1000, 1000, True) == "minsr"    # boundary
    assert resolve_solver("dense", 1, 10**9, True) == "dense"


def test_auto_solver_through_builder():
    """build() with sr.solver=auto resolves from the real built model."""
    from qmcnn_tpu import configs as cfglib
    from qmcnn_tpu.builder import build

    cfg = cfglib.Config(
        name="t",
        lattice=cfglib.LatticeConfig(shape=(4, 4)),
        model=cfglib.ModelConfig(channels=(4, 4), kernel_size=3),
        hamiltonian=cfglib.HamiltonianConfig(kind="heisenberg"),
        sampler=cfglib.SamplerConfig(n_walkers=64),
        sr=cfglib.SRConfig(enabled=True, solver="auto"),
    )
    vmc, params, lattice = build(cfg)
    # tiny net: P (~600) >= M=64 -> minsr
    assert vmc.sr.solver == "minsr"
    cfg2 = dataclasses.replace(
        cfg, sampler=cfglib.SamplerConfig(n_walkers=2048))
    vmc2, _, _ = build(cfg2)
    assert vmc2.sr.solver == "pcg"


@pytest.mark.parametrize("real_mode", [False, True])
def test_minsr_ring_assembly_matches_gather(real_mode):
    """'ring' (ppermute block) distributed minSR == 'gather' == the
    single-device solve, for both complex and real-J_im-skip modes."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from qmcnn_tpu.ops.cplx import C
    from qmcnn_tpu.parallel.mesh import walker_mesh

    v, log_psi_fn, s = setup(complex_params=not real_mode)
    rng = np.random.default_rng(13)
    de_re = rng.normal(size=M).astype(np.float32)
    de_im = (np.zeros(M, np.float32) if real_mode
             else rng.normal(size=M).astype(np.float32))
    de_re -= de_re.mean()
    de_im -= de_im.mean()
    e_loc = C(jnp.asarray(de_re), jnp.asarray(de_im))
    # grads consistent with e_loc (F = O~^T eps / M), so the reported
    # parameter-space residual is meaningful and must be small
    flatp, unravel2 = jax.flatten_util.ravel_pytree(v)

    def f_re(fp, si):
        return log_psi_fn(unravel2(fp), si[None, :]).re[0]

    def f_im(fp, si):
        return log_psi_fn(unravel2(fp), si[None, :]).im[0]

    j_re = np.asarray(jax.vmap(jax.grad(f_re), (None, 0))(flatp, s))
    j_re = j_re - j_re.mean(0, keepdims=True)
    j_im = np.asarray(jax.vmap(jax.grad(f_im), (None, 0))(flatp, s))
    j_im = j_im - j_im.mean(0, keepdims=True)
    f_vec = (j_re.T @ de_re + j_im.T @ de_im) / M
    grads = unravel2(jnp.asarray(f_vec.astype(np.float32)))

    kw = dict(solver="minsr", diag_shift0=0.1, diag_shift_decay=1.0,
              diag_shift_min=0.1, real_log_psi=real_mode)
    want, _, _ = SR(**kw).solve(log_psi_fn, v, s, grads, jnp.asarray(0),
                                e_loc=e_loc)

    mesh = walker_mesh(8)
    grads_spec = jax.tree_util.tree_map(lambda _: P(), grads)
    v_spec = jax.tree_util.tree_map(lambda _: P(), v)
    deltas = {}
    for assembly in ("gather", "ring"):
        sr = SR(minsr_assembly=assembly, **kw)

        def local(vv, ss, gg, ee):
            d, _, res = sr.solve(log_psi_fn, vv, ss, gg, jnp.asarray(0),
                                 axis_name="dp", e_loc=ee)
            return d, res

        f = shard_map(
            local, mesh=mesh,
            in_specs=(v_spec, P("dp"), grads_spec, C(P("dp"), P("dp"))),
            out_specs=(grads_spec, P()), check_vma=False,
        )
        got, res = jax.jit(f)(v, s, grads, e_loc)
        assert float(res) < 1e-3
        deltas[assembly], _ = jax.flatten_util.ravel_pytree(got)

    wflat, _ = jax.flatten_util.ravel_pytree(want)
    np.testing.assert_allclose(np.asarray(deltas["gather"]),
                               np.asarray(wflat), rtol=5e-3, atol=1e-6)
    # ring vs gather: same math, different reduction order only
    np.testing.assert_allclose(np.asarray(deltas["ring"]),
                               np.asarray(deltas["gather"]),
                               rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# SPRING (momentum minSR, arXiv:2401.10190)
# ---------------------------------------------------------------------------

def _spring_fixture(seed=11):
    from qmcnn_tpu.ops.cplx import C

    v, log_psi_fn, s = setup()
    rng = np.random.default_rng(seed)
    de_re = rng.normal(size=M).astype(np.float32)
    de_im = rng.normal(size=M).astype(np.float32)
    e_loc = C(jnp.asarray(de_re), jnp.asarray(de_im))

    # exact F = O~^T eps / M from dense scores (as in the minsr test)
    flatp, unravel = jax.flatten_util.ravel_pytree(v)

    def f_re(fp, si):
        return log_psi_fn(unravel(fp), si[None, :]).re[0]

    def f_im(fp, si):
        return log_psi_fn(unravel(fp), si[None, :]).im[0]

    j_re = np.asarray(jax.vmap(jax.grad(f_re), (None, 0))(flatp, s))
    j_im = np.asarray(jax.vmap(jax.grad(f_im), (None, 0))(flatp, s))
    de_re_c = de_re - de_re.mean()
    de_im_c = de_im - de_im.mean()
    jc_re = j_re - j_re.mean(axis=0, keepdims=True)
    jc_im = j_im - j_im.mean(axis=0, keepdims=True)
    f_vec = (jc_re.T @ de_re_c + jc_im.T @ de_im_c) / M
    grads = unravel(jnp.asarray(f_vec.astype(np.float32)))
    s_dense, _, flat = dense_s(log_psi_fn, v, s)
    return v, log_psi_fn, s, e_loc, grads, f_vec, s_dense, flat


def test_spring_mu0_equals_plain_minsr():
    v, log_psi_fn, s, e_loc, grads, _, _, flat = _spring_fixture()
    shift = 0.1
    kw = dict(solver="minsr", diag_shift0=shift, diag_shift_decay=1.0,
              diag_shift_min=shift)
    want, _, _ = SR(**kw).solve(log_psi_fn, v, s, grads, jnp.asarray(0),
                                e_loc=e_loc)
    d0 = jnp.zeros((flat.size,), jnp.float32)
    got, _, res, new_prev = SR(momentum=0.0, **kw).solve_spring(
        log_psi_fn, v, s, grads, jnp.asarray(0), d0, e_loc=e_loc)
    a, _ = jax.flatten_util.ravel_pytree(want)
    b, _ = jax.flatten_util.ravel_pytree(got)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(new_prev), np.asarray(b),
                               rtol=1e-6)
    assert float(res) < 1e-3


def test_spring_solves_documented_system():
    """delta must satisfy (S + shift) delta = F + shift * mu * delta_prev
    (equivalently: delta = mu d + argmin ||O~ x - (eps - mu O~ d)|| + reg)."""
    v, log_psi_fn, s, e_loc, grads, f_vec, s_dense, flat = _spring_fixture()
    shift, mu = 0.05, 0.7
    rng = np.random.default_rng(13)
    d_prev = rng.normal(size=flat.size).astype(np.float32) * 0.05
    sr = SR(solver="minsr", momentum=mu, diag_shift0=shift,
            diag_shift_decay=1.0, diag_shift_min=shift)
    delta, _, res, new_prev = jax.jit(
        lambda p, s_, g, st, d, e: sr.solve_spring(log_psi_fn, p, s_, g, st,
                                                   d, e_loc=e)
    )(v, s, grads, jnp.asarray(0), jnp.asarray(d_prev), e_loc)
    d, _ = jax.flatten_util.ravel_pytree(delta)
    a = s_dense + shift * np.eye(flat.size)
    want = np.linalg.solve(a, f_vec + shift * mu * d_prev)
    np.testing.assert_allclose(np.asarray(d), want, rtol=5e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(new_prev), np.asarray(d))
    assert float(res) < 1e-3


def test_spring_rejects_non_minsr():
    sr = SR(solver="pcg", momentum=0.9)
    v, log_psi_fn, s = setup()
    grads = jax.tree_util.tree_map(lambda x: 0.01 * jnp.ones_like(x), v)
    with pytest.raises(ValueError):
        sr.solve_spring(log_psi_fn, v, s, grads, jnp.asarray(0),
                        jnp.zeros((3,)), e_loc=None)


def test_spring_training_step_threads_carry():
    """A VMC step with sr.momentum > 0 produces and updates sr_aux."""
    from qmcnn_tpu import configs as cfglib
    from qmcnn_tpu.builder import build

    cfg = cfglib.Config(
        lattice=cfglib.LatticeConfig(shape=(6,)),
        model=cfglib.ModelConfig(kind="cnn", channels=(3,), kernel_size=3),
        hamiltonian=cfglib.HamiltonianConfig(kind="tfim", h=1.0),
        sampler=cfglib.SamplerConfig(n_walkers=32, n_therm_sweeps=2),
        sr=cfglib.SRConfig(enabled=True, solver="minsr", momentum=0.8,
                           diag_shift0=0.01, diag_shift_decay=1.0,
                           diag_shift_min=0.01),
        run=cfglib.RunConfig(seed=0, chunk_size=None),
    )
    vmc, params, _ = build(cfg)
    state = vmc.init_state(jax.random.key(0), 32, params)
    assert state.sr_aux is not None and state.sr_aux.ndim == 1
    ids = jnp.arange(32)
    state2, _ = jax.jit(vmc.step)(state, jax.random.key(1), ids)
    assert float(jnp.linalg.norm(state2.sr_aux)) > 0
    state3, _ = jax.jit(vmc.step)(state2, jax.random.key(2), ids)
    assert not np.allclose(np.asarray(state3.sr_aux),
                           np.asarray(state2.sr_aux))


def test_chol_or_eigh_solve_survives_f32_pivot_failure():
    """f32 Cholesky on an ill-conditioned shifted Gram can hit a negative
    pivot from rounding and silently return NaN — the production failure
    of the r3 depth-12 rung (every recipe NaN'd in the first dispatch
    with finite forward/E_loc/Jacobian). chol_or_eigh_solve must detect
    the non-finite fast path and fall back to the eigh pseudo-solve,
    which must match the float64 clipped-spectrum reference."""
    import numpy as np

    from qmcnn_tpu.sr import chol_or_eigh_solve

    rng = np.random.default_rng(0)
    n = 128
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    # a slightly indefinite matrix (the rounding-equivalent of a
    # degenerate PSD Gram): shift makes it PD in exact math at the
    # dominant scale, but f32 pivots go negative
    w = np.full(n, -1e-2)
    w[:8] = 1e4
    gram = (q * w) @ q.T
    shift = jnp.asarray(1e-3, jnp.float32)
    a = jnp.asarray(gram, jnp.float32) + shift * jnp.eye(n, dtype=jnp.float32)
    rhs = jnp.asarray(rng.normal(size=(n,)), jnp.float32)

    # precondition of the test: the plain fast path really is non-finite
    y_cho = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(a), rhs)
    assert not bool(jnp.isfinite(y_cho).all())

    y = jax.jit(chol_or_eigh_solve)(a, rhs, shift)
    assert np.isfinite(np.asarray(y)).all()
    w64, v64 = np.linalg.eigh(np.asarray(a, np.float64))
    ref = v64 @ ((v64.T @ np.asarray(rhs, np.float64))
                 / np.maximum(w64, 1e-3))
    err = np.linalg.norm(np.asarray(y) - ref) / np.linalg.norm(ref)
    assert err < 1e-4

    # well-conditioned case: identical to the plain cholesky path
    a2 = jnp.eye(16) * 2.0
    rhs2 = jnp.arange(16, dtype=jnp.float32)
    y2 = chol_or_eigh_solve(a2, rhs2, jnp.asarray(0.1, jnp.float32))
    np.testing.assert_allclose(np.asarray(y2), np.asarray(rhs2) / 2.0,
                               rtol=1e-6)
