"""Predefined pulse families.

* :mod:`.dd` -- dynamical-decoupling sequences (FID, SE, CPMG, UDD,
  PDD, CDD) with closed-form oracles in :mod:`..analytic`.
* :mod:`.qft` -- the Ising-type quantum Fourier transform pulse of
  Ivanov/Johanning/Wunderlich (the 4-qubit benchmark configuration,
  cf. /root/reference/examples/qft.py).
* :mod:`.rb` -- single-qubit Clifford pulses and randomized
  benchmarking sequence sampling
  (cf. /root/reference/examples/randomized_benchmarking.py).
* :mod:`.exchange` -- exchange-coupled spin-qubit chains, the Dial
  1/f^alpha charge-noise spectrum, and the published 4-spin CNOT pulse
  (cf. /root/reference/examples/data/CNOT.mat).
"""
from . import dd, exchange, qft, rb

__all__ = ['dd', 'exchange', 'qft', 'rb']
