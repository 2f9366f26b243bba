"""Restricted Boltzmann Machine ansatz (the classic NQS wavefunction,
Carleo & Troyer, Science 355:602 (2017)) — a second model family next to
the CNN (SURVEY.md R2's genre includes it as the standard baseline).

log psi(s) = sum_i a_i s_i + sum_j lncosh( (W s)_j + b_j )

TPU-native: the hidden pre-activations are one [batch, N] x [N, H] MXU
matmul. Real-parameter by default; ``complex_params=True`` stores (re, im)
leaf pairs (see ops/cplx.py — the backend has no complex dtypes) and uses
the pair lncosh, giving complex amplitudes with all-real parameters.

A translation-invariant variant (``tie_translations=True``) ties the weight
matrix to ``alpha`` filters convolved circularly over the lattice — the
RBM analogue of the CNN's weight sharing; implemented via the same
circulant expansion as models/cnn.py so it reuses one code path.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from qmcnn_tpu.models.cnn import circulant_weight
from qmcnn_tpu.ops import cplx
from qmcnn_tpu.ops.cplx import C

Array = jax.Array


class LogPsiRBM(nn.Module):
    """RBM log-amplitude.

    Args:
      lattice_shape: for ``tie_translations`` (circulant weight tying).
      alpha: hidden-unit density H = alpha * N.
      complex_params: complex amplitudes via (re, im) real leaf pairs.
      tie_translations: translation-invariant weight tying (drops the
        visible bias, which is not invariant).
    """

    lattice_shape: Tuple[int, ...]
    alpha: int = 2
    complex_params: bool = False
    tie_translations: bool = False
    param_scale: float = 0.05

    @nn.compact
    def __call__(self, s: Array) -> C:
        n = int(np.prod(self.lattice_shape))
        h = self.alpha * n
        init = nn.initializers.normal(self.param_scale)

        def make(name, shape):
            return self.param(name, init, shape, jnp.float32)

        if self.tie_translations:
            # alpha circulant filters [*shape, 1, alpha] -> [N, N*alpha]
            filt_re = make("filter_re", (*self.lattice_shape, 1, self.alpha))
            w_re = circulant_weight(filt_re, self.lattice_shape)
            if self.complex_params:
                filt_im = make("filter_im",
                               (*self.lattice_shape, 1, self.alpha))
                w_im = circulant_weight(filt_im, self.lattice_shape)
            b_re = jnp.tile(make("hidden_bias_re", (self.alpha,)), n)
            if self.complex_params:
                b_im = jnp.tile(make("hidden_bias_im", (self.alpha,)), n)
            a_re = a_im = None  # visible bias breaks invariance
        else:
            w_re = make("kernel_re", (n, h))
            b_re = make("hidden_bias_re", (h,))
            a_re = make("visible_bias_re", (n,))
            if self.complex_params:
                w_im = make("kernel_im", (n, h))
                b_im = make("hidden_bias_im", (h,))
                a_im = make("visible_bias_im", (n,))

        pre_re = s @ w_re + b_re
        if self.complex_params:
            pre = C(pre_re, s @ w_im + b_im)
            out = cplx.lncosh(pre)
            re = out.re.sum(-1)
            im = out.im.sum(-1)
            if a_re is not None:
                re = re + s @ a_re
                im = im + s @ a_im
            return C(re, im)
        out = cplx.lncosh_real(pre_re).sum(-1)
        if a_re is not None:
            out = out + s @ a_re
        return C(out, jnp.zeros_like(out))
