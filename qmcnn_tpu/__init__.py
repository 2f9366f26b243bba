"""qmcnn_tpu: a TPU-native variational Monte Carlo framework.

From-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
``dmaloneynygc/qmcnn`` (a CPU neural-quantum-states VMC code; see SURVEY.md):
CNN wavefunction ansaetze, Metropolis sampling over spin lattices, local
energies via connected-configuration enumeration, SGD and stochastic
reconfiguration, with walkers sharded across TPU chips via shard_map and
psum-over-ICI estimator reductions.
"""

__version__ = "0.1.0"

from qmcnn_tpu.lattice import Lattice, chain, square  # noqa: F401
