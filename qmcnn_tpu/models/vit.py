"""Vision-Transformer log-amplitude ansatz log psi_theta(s).

A beyond-reference model family (the reference — SURVEY.md §2.1, R2 — ships
only the CNN): transformer ansaetze are the current accuracy frontier for
frustrated 2D models in the NQS literature (ViT wavefunctions for J1-J2,
e.g. Viteritti/Rende/Becca-school designs, PAPERS.md), and they map even
better onto the TPU than convs do — every hot op is a plain batched matmul
on the MXU with static shapes.

Architecture (TPU-first choices):

  * **Patchify**: the L1 x ... x Ld periodic lattice is cut into p^d-site
    patches -> T = prod(L_i/p) tokens, embedded by one Dense. No absolute
    positional encoding anywhere.
  * **Relative-position attention on the patch torus**: each head carries a
    learned bias table indexed by the *periodic* displacement between two
    patches, so every block is exactly equivariant under patch-grid
    translations. Two modes:
      - ``factored=True`` (default): the attention matrix is softmax of the
        position bias alone — input-independent "factored attention", the
        form reported in the NQS literature to train more stably than
        dot-product attention for ground states, and cheaper (no QK^T).
        XLA hoists softmax(bias) out of the batch entirely.
      - ``factored=False``: standard dot-product multi-head attention with
        the same relative bias added to the logits.
  * **Real trunk, complex head**: the trunk (LN -> attention -> MLP, pre-LN
    residual blocks) is real-valued — the axon TPU backend has no complex
    dtype (ops/cplx.py) and real matmuls run at full MXU rate, optionally in
    bfloat16 end-to-end (``compute_dtype``) with the f32 cast at the head
    only (the per-layer-cast-back trap measured in BASELINE.md r2). Complex
    amplitudes enter through an RBM-style head: per-token complex features
    z = W_re h + i W_im h, ln cosh, summed over tokens and features.
  * **Exact translation invariance**: the trunk is invariant under patch
    translations (relpos attention + token-sum head); the residual subgroup
    of sub-patch shifts (p^d elements, e.g. 4 for p=2 in 2D) is projected
    out explicitly by logmeanexp over rolled inputs — the same trick as
    models/cnn.py TranslationAveraged, but over p^d forwards instead of N.

All parameters are real float32, so the gradient/SR conventions stay the
simple real-parameter ones (SURVEY.md hard part #1).

API matches the other families: ``apply(vars, s)`` with s [batch, n_sites]
in {-1.,+1.} returns a ``C`` pair of [batch] log-amplitudes.
"""
from __future__ import annotations

import functools
import itertools
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from qmcnn_tpu.ops import cplx
from qmcnn_tpu.ops.cplx import C

Array = jax.Array


@functools.lru_cache(maxsize=None)
def _relpos_index(grid: Tuple[int, ...]) -> np.ndarray:
    """[T, T] int32 table: entry (i, j) = flat index of the *periodic*
    displacement (pos_i - pos_j) mod grid on the patch torus. Attention
    biases looked up through this table depend only on relative position,
    which is what makes the blocks patch-translation equivariant."""
    t = int(np.prod(grid))
    coords = np.stack(np.unravel_index(np.arange(t), grid), -1)  # [T, d]
    diff = (coords[:, None, :] - coords[None, :, :]) % np.asarray(grid)
    return np.ravel_multi_index(
        tuple(np.moveaxis(diff, -1, 0)), grid).astype(np.int32)


def _patchify(grid: Array, lattice_shape: Tuple[int, ...], patch: int
              ) -> Array:
    """[B, *lattice_shape] -> [B, T, patch**d] token layout (row-major
    patch grid; spins inside a patch in row-major site order)."""
    b = grid.shape[0]
    d = len(lattice_shape)
    split = [b]
    for length in lattice_shape:
        split += [length // patch, patch]
    x = grid.reshape(split)
    perm = [0] + [1 + 2 * i for i in range(d)] + [2 + 2 * i for i in range(d)]
    x = x.transpose(perm)
    t = int(np.prod([length // patch for length in lattice_shape]))
    return x.reshape(b, t, patch ** d)


class _Attention(nn.Module):
    """Multi-head attention with learned relative-position bias on the
    patch torus; ``factored=True`` drops QK^T and uses the bias alone."""

    grid: Tuple[int, ...]
    n_heads: int
    factored: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: Array) -> Array:  # [B, T, D]
        t, d = x.shape[1], x.shape[2]
        if d % self.n_heads:
            raise ValueError(f"d_model {d} not divisible by "
                             f"n_heads {self.n_heads}")
        hd = d // self.n_heads
        rel = jnp.asarray(_relpos_index(self.grid))          # [T, T]
        table = self.param("relpos_bias", nn.initializers.normal(0.5),
                           (self.n_heads, t), jnp.float32)
        bias = jnp.take(table, rel, axis=1)                  # [H, T, T]
        v = nn.DenseGeneral((self.n_heads, hd), dtype=self.dtype,
                            name="v")(x)                     # [B, T, H, hd]
        if self.factored:
            # position-only attention: one [T, T] stochastic matrix per
            # head, shared by the whole batch — a single hoisted softmax
            # and one einsum on the MXU.
            attn = jax.nn.softmax(bias, axis=-1).astype(self.dtype)
            out = jnp.einsum("hij,bjhd->bihd", attn, v)
        else:
            q = nn.DenseGeneral((self.n_heads, hd), dtype=self.dtype,
                                name="q")(x)
            k = nn.DenseGeneral((self.n_heads, hd), dtype=self.dtype,
                                name="k")(x)
            logits = jnp.einsum("bihd,bjhd->bhij", q, k).astype(jnp.float32)
            logits = logits / np.sqrt(hd) + bias[None]
            attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhij,bjhd->bihd", attn, v)
        out = out.reshape(x.shape[0], t, d)
        return nn.Dense(d, dtype=self.dtype, name="proj")(out)


class _Block(nn.Module):
    """Pre-LN transformer block (per-token ops are trivially translation
    equivariant; the attention is equivariant via the relpos bias)."""

    grid: Tuple[int, ...]
    n_heads: int
    mlp_ratio: int
    factored: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = x.shape[-1]
        h = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        x = x + _Attention(grid=self.grid, n_heads=self.n_heads,
                           factored=self.factored, dtype=self.dtype,
                           name="attn")(h)
        h = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(self.mlp_ratio * d, dtype=self.dtype, name="mlp1")(h)
        h = nn.gelu(h)
        h = nn.Dense(d, dtype=self.dtype, name="mlp2")(h)
        return x + h


class LogPsiViT(nn.Module):
    """Translation-invariant ViT wavefunction (see module docstring)."""

    lattice_shape: Tuple[int, ...]
    #: per-block model width; transformers are constant-width, so all
    #: entries must be equal — len(channels) is the block count
    channels: Sequence[int] = (32, 32)
    #: patch edge (same along every dim); must divide every L_i
    patch: int = 2
    n_heads: int = 4
    mlp_ratio: int = 2
    #: position-only ("factored") attention vs dot-product + bias
    factored: bool = True
    #: complex lncosh head (frustrated models) vs real head
    complex_params: bool = False
    #: head init scale (trunk uses flax lecun defaults)
    param_scale: float = 0.05
    #: 'float32' | 'bfloat16' trunk compute (params stay f32; the head and
    #: the logmeanexp projection always run f32)
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, s: Array) -> C:
        shape = tuple(self.lattice_shape)
        p = self.patch
        for length in shape:
            if length % p:
                raise ValueError(f"patch {p} does not divide lattice "
                                 f"shape {shape}")
        widths = set(self.channels)
        if len(widths) != 1:
            raise ValueError("vit is constant-width: all channels entries "
                             f"must be equal (got {tuple(self.channels)})")
        d_model = self.channels[0]
        grid_shape = tuple(length // p for length in shape)
        dtype = jnp.dtype(self.compute_dtype)

        batch = s.shape[0]
        grid = s.reshape(batch, *shape).astype(jnp.float32)
        # residual sub-patch translations, projected out explicitly
        axes = tuple(range(1, 1 + len(shape)))
        shifts = list(itertools.product(*[range(p)] * len(shape)))
        rolled = jnp.stack(
            [jnp.roll(grid, sh, axis=axes) for sh in shifts], axis=0)
        a = len(shifts)
        x = rolled.reshape(a * batch, *shape)

        # --- trunk (shared params across the shift copies) ---
        tokens = _patchify(x, shape, p).astype(dtype)        # [AB, T, p^d]
        h = nn.Dense(d_model, dtype=dtype, name="embed")(tokens)
        for i in range(len(self.channels)):
            h = _Block(grid=grid_shape, n_heads=self.n_heads,
                       mlp_ratio=self.mlp_ratio, factored=self.factored,
                       dtype=dtype, name=f"block{i}")(h)
        h = nn.LayerNorm(dtype=dtype, name="ln_f")(h).astype(jnp.float32)

        # --- head: per-token (complex) features, lncosh, token+feature sum
        head_init = nn.initializers.normal(
            self.param_scale / np.sqrt(d_model))
        zre = nn.Dense(d_model, kernel_init=head_init, name="head_re")(h)
        if self.complex_params:
            zim = nn.Dense(d_model, kernel_init=head_init,
                           name="head_im")(h)
            z = cplx.lncosh(C(zre, zim))
            logs = C(z.re.reshape(a * batch, -1).sum(-1),
                     z.im.reshape(a * batch, -1).sum(-1))
        else:
            z = cplx.lncosh_real(zre)
            out = z.reshape(a * batch, -1).sum(-1)
            logs = C(out, jnp.zeros_like(out))
        # project onto the zero-momentum sector of the residual shifts
        return cplx.logmeanexp(logs.reshape(a, batch), axis=0)
