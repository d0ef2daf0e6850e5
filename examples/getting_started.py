"""Getting started: build a Hadamard gate from primitive pulses,
compute its dephasing filter function, and evaluate infidelities for
white and 1/f noise.

Equivalent of the reference's getting_started notebook
(/root/reference/doc/source/examples/getting_started.ipynb).

Run: python examples/getting_started.py
"""
import sys
from math import pi
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import filter_functions_tpu as ff  # noqa: E402
from filter_functions_tpu import config, util  # noqa: E402


def main():
    config.enable_host_cpu()
    with config.on_host():
        I, X, Y, Z = util.paulis

        # A Hadamard as a pi/2 y-rotation followed by a pi x-rotation,
        # with constant coupling to dephasing (sigma_z) noise.
        H_c = [[X / 2, [0, pi], 'X'],
               [Y / 2, [pi / 2, 0], 'Y']]
        H_n = [[Z / 2, [1, 1], 'Z']]
        dt = [1, 1]
        hadamard = ff.PulseSequence(H_c, H_n, dt)
        print(hadamard)

        # The total propagator should be a Hadamard up to global phase.
        H_gate = np.array([[1, 1], [1, -1]]) / np.sqrt(2)
        equal, phase = util.oper_equiv(
            hadamard.total_propagator.to_numpy(), H_gate)
        print(f'Total propagator is Hadamard: {equal} '
              f'(global phase {phase:+.3f})')

        # Fidelity filter function on the default frequency grid.
        omega = util.get_sample_frequencies(hadamard, n_samples=400)
        F = hadamard.get_filter_function(omega).to_numpy().real
        print(f'F(omega) shape {F.shape}; '
              f'DC limit F(omega->0) = {F[0, 0, 0]:.4f}')

        # Infidelities for white and 1/f spectra.
        for name, S in [('white', 1e-4 * np.ones_like(omega)),
                        ('1/f  ', 1e-4 / omega)]:
            infid = np.asarray(ff.infidelity(hadamard, S, omega))
            print(f'infidelity ({name}): {infid.sum():.3e}')

        # Convergence of the frequency integral.
        n_samples, infids = ff.infidelity(
            hadamard, lambda w: 1e-4 / w,
            {'n_min': 100, 'n_max': 1000, 'n_points': 5},
            test_convergence=True)
        print('convergence:', dict(zip(np.asarray(n_samples).tolist(),
                                       np.asarray(infids).ravel().round(9))))


if __name__ == '__main__':
    main()
