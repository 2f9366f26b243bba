"""qmcnn_tpu: a TPU-native variational Monte Carlo framework.

From-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
``dmaloneynygc/qmcnn`` (a CPU neural-quantum-states VMC code; see SURVEY.md):
CNN wavefunction ansaetze, Metropolis sampling over spin lattices, local
energies via connected-configuration enumeration, SGD and stochastic
reconfiguration, with walkers sharded across TPU chips via shard_map and
psum-over-ICI estimator reductions.

Quick API tour::

    from qmcnn_tpu import configs, builder
    cfg = configs.load("configs/tfim16_sgd.yaml")
    vmc, params, lattice = builder.build(cfg)          # single device
    sharded, params, lattice = builder.build_sharded(cfg)  # walker mesh

or assemble pieces directly: ``Lattice``, ``LogPsiCNN``, ``TFIM`` /
``Heisenberg``, ``MetropolisSampler``, ``SR``, ``VMC``.
"""

__version__ = "0.1.0"

from qmcnn_tpu.lattice import Lattice, chain, square  # noqa: F401
from qmcnn_tpu.models.cnn import (  # noqa: F401
    LogPsiCNN, TranslationAveraged, log_psi_apply,
)
from qmcnn_tpu.ops.cplx import C  # noqa: F401
from qmcnn_tpu.ops.hamiltonians import TFIM, Heisenberg, j1j2  # noqa: F401
from qmcnn_tpu.ops.local_energy import local_energy  # noqa: F401
from qmcnn_tpu.sampler.metropolis import MetropolisSampler  # noqa: F401
from qmcnn_tpu.sr import SR  # noqa: F401
from qmcnn_tpu.vmc import VMC, TrainState  # noqa: F401
