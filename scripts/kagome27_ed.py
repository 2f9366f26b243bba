"""27-site kagome (3x3 cells) Heisenberg AF: native S^z-sector Lanczos.

Odd N -> the ground state lives in S^z = +-1/2 (n_up = 13). Sector dim
C(27,13) = 20,058,300 — ~7.4x the 24-site run that took 1593 s, so expect
hours. Result feeds the kagome3x3 ED gate (sqrt3 prior A/B).
"""
import json
import time

import numpy as np

from qmcnn_tpu.lattice import Lattice
from qmcnn_tpu.ops import exact_native

lat = Lattice(shape=(3, 3), pbc=True, geometry="kagome")
assert lat.n_sites == 27, lat.n_sites
bonds = np.asarray(lat.nn_bonds)
print(f"kagome 3x3 cells: {lat.n_sites} sites, {len(bonds)} NN bonds", flush=True)
t0 = time.time()
op = exact_native.heisenberg_sector_operator(27, bonds, n_up=13)
print(f"basis built in {time.time()-t0:.0f}s; dim={op.shape[0]:,}", flush=True)
e0 = exact_native.ground_energy(op)
dt = time.time() - t0
out = {"n_sites": 27, "shape": [3, 3], "geometry": "kagome",
       "sector_n_up": 13, "dim": int(op.shape[0]),
       "e0": e0, "e0_per_site": e0 / 27, "seconds": dt}
print(json.dumps(out), flush=True)
with open("runs/kagome27_ed.json", "w") as f:
    json.dump(out, f, indent=1)
