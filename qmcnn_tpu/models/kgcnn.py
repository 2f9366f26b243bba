"""Kagome space-group equivariant GCNN via the depleted-triangular
embedding.

Geometry fact: the kagome lattice IS a triangular lattice with one of
four sublattices removed. In fine coordinates (u, v) with primitive
vectors a1/2, a2/2 (half the kagome Bravais vectors), the kagome sites of
an Lx x Ly cell torus occupy the fine 2Lx x 2Ly triangular torus at

    A(cx,cy) -> (2cx,   2cy  )     B -> (2cx+1, 2cy  )     C -> (2cx, 2cy+1)

and the (odd, odd) fine sublattice is EMPTY (the hexagon centers — the
lattice.py site_positions convention: A at 0, B at a1/2, C at a2/2).

That reduces kagome equivariance to machinery the framework already has:
embed the 3N spins into the fine torus (zeros at the empty sublattice)
and run the p6m-equivariant LogPsiTriGCNN (models/tgcnn.py) on the fine
grid. Group theory of why this is exactly right: the TriGCNN projects
over the FULL p6m of the fine torus (fine translations x D6 about the
fine origin), and the kagome space group — cell translations x D6 about
the hexagon centers, e.g. T_c R T_{-c} with c = (1,1) — is a SUBGROUP of
it (T_c R T_{-c} = T_{c - Rc} R with c - Rc an integer fine vector), so
the projected psi is exactly invariant under every true kagome isometry
(tested: cell translations, the 60-degree rotation and a reflection
about a hexagon center, as site permutations). The extra group elements
(odd translations etc.) map valid kagome patterns to patterns with spins
on empty slots; the network simply also averages over those evaluations —
harmless additional terms, never sampled, costing a 4/3 site overhead.

Note the rotation center subtlety this construction gets right for free:
kagome has NO 6-fold axis through a site (sites are C2v); the 6-fold
axes are the empty hexagon centers — exactly the points the fine-torus
projection rotates about once translations are folded in.

Config: model.kind=gcnn + lattice.geometry=kagome routes here
(builder.py); kernel_size -> fine-star radius as for the triangular
GCNN; characters follow tgcnn's D6 table (A1 for the ground sector).

Reference parity note: SURVEY.md's reference has square-lattice CNNs
only; this is beyond-parity capability for the kagome sign-structure
program (BASELINE.md r2 kagome rows -> VERDICT r3 item 2).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from qmcnn_tpu.ops.cplx import C

Array = jax.Array


def fine_embedding(cell_shape: Tuple[int, int]) -> Tuple[np.ndarray, np.ndarray]:
    """(site -> fine flat index, fine flat occupancy mask).

    Fine torus is [2Lx, 2Ly] row-major; kagome site order is cells
    row-major with basis fastest (lattice.py coords convention).
    """
    lx, ly = cell_shape
    fu, fv = 2 * lx, 2 * ly
    idx = np.zeros((lx * ly * 3,), np.int64)
    mask = np.zeros((fu * fv,), bool)
    for cx in range(lx):
        for cy in range(ly):
            for b, (du, dv) in enumerate(((0, 0), (1, 0), (0, 1))):
                u, v = 2 * cx + du, 2 * cy + dv
                site = (cx * ly + cy) * 3 + b
                fine = u * fv + v
                idx[site] = fine
                mask[fine] = True
    return idx, mask


class LogPsiKagomeGCNN(nn.Module):
    """log psi(s) on the kagome torus with exact space-group symmetry.

    A thin embedding wrapper around LogPsiTriGCNN on the 2Lx x 2Ly fine
    triangular torus (empty hexagon-center sublattice held at 0).
    """

    cell_shape: Tuple[int, int]
    channels: Sequence[int] = (8, 8)
    radius: int = 1
    complex_params: bool = False
    param_scale: float = 0.05
    character: str = "A1"
    init_mode: str = "fixed"
    activation: str = "lncosh"
    residual: bool = False
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, s: Array) -> C:
        from qmcnn_tpu.models.tgcnn import LogPsiTriGCNN

        lx, ly = self.cell_shape
        if lx != ly:
            raise ValueError("the kagome GCNN needs a square cell torus "
                             f"(the D6 rotation mixes axes), got {lx}x{ly}")
        idx, _ = fine_embedding((lx, ly))
        batch = s.shape[0]
        fine = jnp.zeros((batch, 4 * lx * ly), s.dtype)
        fine = fine.at[:, jnp.asarray(idx)].set(s.reshape(batch, -1))
        inner = LogPsiTriGCNN(
            lattice_shape=(2 * lx, 2 * ly),
            channels=tuple(self.channels),
            radius=self.radius,
            complex_params=self.complex_params,
            param_scale=self.param_scale,
            character=self.character,
            init_mode=self.init_mode,
            activation=self.activation,
            residual=self.residual,
            compute_dtype=self.compute_dtype,
        )
        return inner(fine)
