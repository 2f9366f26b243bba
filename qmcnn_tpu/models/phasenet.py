"""Dedicated deep phase network: split amplitude/phase ansatz.

Physics. On frustrated lattices the hard part of the ground state is its
SIGN structure. Round-2's kagome elimination chain (BASELINE.md r2 rows)
showed every pair-level diagonal form failing on the 27-site kagome gate:
fixed 120-degree priors (q0 and sqrt3), the two-body amplitude Jastrow,
and learnable pair phases all leave the same ~3% plateau — the missing
structure is a CONFIGURATION-level phase. The split-network ansatz of
Szabo & Castelnovo (PRB 102:214304 (2020)) addresses exactly this: give
the phase its own deep network instead of asking the amplitude stack's
imaginary channel to carry it,

    log psi(s) = log_psi_inner(s) + i * g * phi_theta(s),

with phi a REAL deep CNN over the (cell-grid, basis-channel) spin
encoding and g a scalar gate. |psi| is untouched, so sampling
distributions are exactly preserved (the wrapper composes with any
sampler the inner model supports), and the phase capacity is decoupled
from the amplitude capacity — the knob round 2's depth scans (which
scaled BOTH at once through complex channels) could not turn.

TPU shape. The trunk is the existing LogPsiCNN with real parameters:
circular convs on the cell grid, spatial-sum readout (exact cell-
translation invariance of phi comes free), selu + fan_in init so it
trains at depth (the lncosh/fixed-init collapse documented in
configs.py), residual skips when deeper than two layers.

Init contract: ``g = 0`` exactly, so a phase_net-wrapped model is
BIT-IDENTICAL to the bare one at init (tested) and across warm-starts
from bare checkpoints (utils/transfer.py copies matching leaves; the
trunk + gate keep their fresh init). At g = 0 the trunk's scores vanish
(d log psi / d theta_trunk = i g dphi/dtheta = 0) — the gate's own score
i phi(s) is generically nonzero, so SGD/SR moves g first and the trunk
trains from step 2 on. Saddle caveat (same as models/jastrow.py pair
phases): over an exactly REAL inner state dE/dg = i<[H, Q]> = 0
identically, so pair it with a complex inner or a phase prior — the
production frustrated recipes all do.

Reference parity note: SURVEY.md's reference has a single complex CNN
(R2); the split amplitude/phase form is beyond-parity capability aimed
at the sign-problem lattices the reference never ran.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from qmcnn_tpu.ops import cplx
from qmcnn_tpu.ops.cplx import C

Array = jax.Array


class PhaseNet(nn.Module):
    """log psi(s) = inner(s) + i * gate * trunk(s).

    ``trunk`` must be a real-output log-psi module (its C.im is ignored);
    ``gate`` is a scalar parameter initialized to zero (exact identity at
    init — see module docstring for the gradient-flow contract).
    """

    inner: nn.Module
    trunk: nn.Module

    @nn.compact
    def __call__(self, s: Array) -> C:
        out = cplx.as_c(self.inner(s))
        phi = cplx.as_c(self.trunk(s)).re
        gate = self.param("gate", nn.initializers.zeros, (), jnp.float32)
        return C(out.re, out.im + gate * phi)


def wrap_phase_net(inner: nn.Module, lattice, channels, kernel_size: int = 3
                   ) -> nn.Module:
    """Wrap ``inner`` with a deep real-CNN phase trunk over ``lattice``.

    The trunk is fixed to the deep-stack-safe recipe (selu activation,
    fan_in init, residual skips when more than two layers) — the
    documented requirements for depth in configs.py; its capacity is set
    by ``channels``/``kernel_size`` (config: model.phase_net_channels /
    model.phase_net_kernel).
    """
    from qmcnn_tpu.models.cnn import LogPsiCNN

    trunk = LogPsiCNN(
        lattice_shape=tuple(lattice.shape),
        channels=tuple(channels),
        kernel_size=kernel_size,
        complex_params=False,
        param_scale=1.0,
        pbc=lattice.pbc,
        init_mode="fan_in",
        activation="selu",
        residual=len(tuple(channels)) > 2,
        basis=lattice.basis,
    )
    return PhaseNet(inner=inner, trunk=trunk)
