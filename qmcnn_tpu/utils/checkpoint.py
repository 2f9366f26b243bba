"""Orbax checkpointing of the full train state (SURVEY.md section 5,
"Checkpoint / resume").

MCMC is restart-friendly: the checkpoint holds the complete TrainState
pytree — params, optimizer state, walker configurations and their cached
log-amplitudes, and the step counter. On restore, training continues
bit-identically on the same mesh layout; if walker state is discarded
(e.g. different walker count), re-thermalize briefly instead.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

import orbax.checkpoint as ocp

from qmcnn_tpu.vmc import TrainState


class CheckpointManager:
    """save-every-N / keep-last-K manager over a TrainState."""

    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep, create=True, enable_async_checkpointing=False
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: TrainState):
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: TrainState, step: Optional[int] = None
                ) -> TrainState:
        """Restore into the structure/sharding of ``template``."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
            if isinstance(x, jax.Array) else x,
            template,
        )
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def close(self):
        self._mgr.close()
