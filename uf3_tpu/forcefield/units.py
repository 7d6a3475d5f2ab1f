"""
Unit system: eV (energy), angstrom (length), amu (mass).

The derived time unit is sqrt(amu * A^2 / eV) = 10.1805 fs, matching the
ASE convention so trajectories are directly comparable.
"""

import numpy as np

# 1 fs in internal time units
fs = 0.09822694750253231
ps = 1000.0 * fs

# Boltzmann constant, eV / K
kB = 8.617333262e-5

# pressure conversions (internal = eV / A^3)
GPa = 1.0 / 160.21766208
bar = 1e-4 * GPa
