"""Warm-start parameter transfer between experiments (run.init_from).

The conv kernels of every model family here (CNN, GCNN, RBM dense weights
excepted) are lattice-size-agnostic: a kernel of shape (k, k, c_in, c_out)
is the same object on an 8x8 and a 10x10 lattice. That makes the standard
NQS scaling trick available — converge on a small lattice, then initialize
the larger-lattice run from that state (transfer learning across system
sizes; the sampler re-thermalizes, the optimizer restarts).

The transfer is by flattened key-path + shape match against the fresh
init: leaves found in the source checkpoint with identical shape are
copied, everything else (e.g. extra layers of a deeper target net) keeps
its fresh initialization. Mismatches are reported, never fatal.

Reference parity note: the CPU reference (SURVEY.md R13) only had
framework-native param save/restore; cross-experiment transfer is part of
this framework's checkpoint layer (SURVEY.md section 5, checkpoint/resume).
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np

import orbax.checkpoint as ocp


def _key_str(k) -> str:
    if isinstance(k, jax.tree_util.DictKey):
        return str(k.key)
    if isinstance(k, jax.tree_util.GetAttrKey):
        return k.name
    if isinstance(k, jax.tree_util.SequenceKey):
        return str(k.idx)
    return str(k)


def _flatten(tree) -> dict:
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {"/".join(_key_str(k) for k in path): leaf
            for path, leaf in leaves}


def load_checkpoint_params(directory: str, step: Optional[int] = None,
                           field: str = "params") -> Any:
    """Read a params-shaped subtree of a saved TrainState as host arrays.

    Restores without an abstract template (pure nested containers), so it
    works across configs whose TrainState structures differ — only the
    requested subtree is returned. ``field`` is ``"params"`` (default) or
    ``"ema"`` (the Polyak average of an ema_decay run).

    ``directory`` may also be a ``.npz`` snapshot written by
    :func:`export_params` (qmcnn_tpu.export): a flat
    {key-path: array} archive. Hero params are a few hundred KB, so
    snapshots are committable to git — unlike Orbax trees, they survive
    the VM (three hero checkpoints died with their machines this round).
    """
    if directory.endswith(".npz"):
        with np.load(directory) as z:
            flat = {k: np.asarray(z[k]) for k in z.files}
        if not flat:
            raise ValueError(f"empty params snapshot {directory}")
        return flat  # _flatten() of a flat dict is itself: transfer-ready
    directory = os.path.abspath(directory)
    options = ocp.CheckpointManagerOptions(create=False)
    mgr = ocp.CheckpointManager(directory, options=options)
    try:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {directory}")
        raw = mgr.restore(step)
    finally:
        mgr.close()
    # TrainState is a NamedTuple; StandardRestore without a template yields
    # nested dicts/lists — accept either container form.
    from qmcnn_tpu.vmc import TrainState

    out = None
    if isinstance(raw, dict) and field in raw:
        out = raw[field]
    elif hasattr(raw, field):
        out = getattr(raw, field)
    elif isinstance(raw, (list, tuple)):  # positional TrainState fields
        idx = TrainState._fields.index(field)
        out = raw[idx] if idx < len(raw) else None
    else:
        raise ValueError(
            f"unrecognized checkpoint structure in {directory}: {type(raw)}")
    if out is None:
        raise ValueError(
            f"checkpoint in {directory} has no {field!r} subtree"
            + (" — was the run trained with optimizer.ema_decay > 0?"
               if field == "ema" else ""))
    return out


def _strip_inner(key: str) -> str:
    """Drop path segments named 'inner' — the attribute every wrapper
    module here (Jastrow, PhaseBias, TranslationAveraged, PointGroup/
    SpinFlip projections) nests its wrapped model under. Normalizing both
    sides makes bare <-> wrapped checkpoints transfer-compatible, e.g.
    turning model.jastrow on over a plateaued bare checkpoint, or
    warm-starting a projected net from its unprojected phase-1 run."""
    return "/".join(p for p in key.split("/") if p != "inner")


def transfer_params(fresh: Any, source: Any,
                    expand: bool = False) -> Tuple[Any, int, int]:
    """Copy leaves of ``source`` into ``fresh`` where key-path and shape
    match; exact paths take priority, then a wrapper-transparent retry
    that treats 'inner' nesting segments as transparent on both sides
    (skipped for keys that would become ambiguous). Returns (merged
    pytree with fresh's structure, n_copied, n_kept_fresh).

    ``expand=True`` (run.init_expand) additionally transfers leaves whose
    path matches but whose shape is strictly CONTAINED in the fresh
    leaf's: the source block is embedded at the leading corner and the
    fresh init supplies the new rows/columns (net2net-style width
    expansion). For the conv kernels here — (k, k, c_in, c_out) — widened
    channels start at the fresh scale (~param_scale), so the transferred
    function is perturbed only at second order (new outputs meet
    near-fresh weights downstream): a widened rung resumes near its
    parent's energy instead of cold-starting (r5; the d8/d10/d12 direct
    ladder motivates widening at matched budget, BASELINE.md r4)."""
    src = _flatten(source)
    norm_counts: dict = {}
    for k in src:
        nk = _strip_inner(k)
        norm_counts[nk] = norm_counts.get(nk, 0) + 1
    src_norm = {_strip_inner(k): v for k, v in src.items()
                if norm_counts[_strip_inner(k)] == 1}
    copied = [0, 0]

    def pick(path, leaf):
        key = "/".join(_key_str(k) for k in path)
        cand = src.get(key)
        if cand is None or np.shape(cand) != np.shape(leaf):
            alt = src_norm.get(_strip_inner(key))
            if alt is not None and (np.shape(alt) == np.shape(leaf)
                                    or cand is None):
                cand = alt
        if cand is not None and np.shape(cand) == np.shape(leaf):
            copied[0] += 1
            return np.asarray(cand).astype(np.asarray(leaf).dtype)
        if (expand and cand is not None
                and np.ndim(cand) == np.ndim(leaf)
                and all(cs <= ls for cs, ls in zip(np.shape(cand),
                                                   np.shape(leaf)))):
            # fresh entries at 0.1x their init: full-scale fan_in entries
            # would perturb the transferred function at O(1) (new channels
            # contribute immediately), while EXACT zeros are a dead saddle
            # (a zero-in/zero-out block gets zero gradient — the classic
            # net2net pitfall). 0.1x keeps the start near the parent
            # energy AND breaks the new-channel symmetry.
            out = np.array(leaf, copy=True) * np.asarray(
                0.1, np.asarray(leaf).dtype)
            out[tuple(slice(0, d) for d in np.shape(cand))] = (
                np.asarray(cand).astype(out.dtype))
            copied[0] += 1
            return out
        copied[1] += 1
        return leaf

    merged = jax.tree_util.tree_map_with_path(pick, fresh)
    return merged, copied[0], copied[1]


def warm_start(fresh_params: Any, directory: str,
               step: Optional[int] = None, field: str = "params",
               expand: bool = False) -> Any:
    """Load + transfer, with a one-line report."""
    source = load_checkpoint_params(directory, step, field=field)
    merged, n_copied, n_fresh = transfer_params(fresh_params, source,
                                                expand=expand)
    print(f"warm-start from {directory} ({field}): {n_copied} param leaves "
          f"transferred, {n_fresh} kept at fresh init")
    if n_copied == 0:
        raise ValueError(
            f"warm-start from {directory} matched no parameters — wrong "
            "model family/width? (transfer matches on key-path + shape)")
    return merged
