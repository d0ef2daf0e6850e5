"""Calculating quantum processes: decay amplitudes, frequency shifts,
cumulant function, and the error transfer matrix (the full quantum
process up to second order in noise).

Equivalent of the reference's calculating_quantum_processes notebook
(/root/reference/doc/source/examples/calculating_quantum_processes.ipynb).

Run: python examples/calculating_quantum_processes.py
"""
import sys
from math import pi
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import filter_functions_tpu as ff  # noqa: E402
from filter_functions_tpu import config, numeric, superoperator, util  # noqa: E402


def main():
    config.enable_host_cpu()
    with config.on_host():
        I, X, Y, Z = util.paulis

        # A simple NOT gate with dephasing and amplitude noise.
        segments = 20
        dt = np.full(segments, 1.0 / segments)
        amp = np.full(segments, pi)
        pulse = ff.PulseSequence(
            [[X / 2, amp, 'X']],
            [[Z / 2, np.ones(segments), 'Z'],
             [X / 2, np.ones(segments), 'X']],
            dt, basis=ff.Basis.pauli(1))

        omega = util.get_sample_frequencies(pulse, n_samples=400)
        S = 1e-4 / omega  # 1/f noise on both channels

        # Decay amplitudes Gamma_{alpha beta, kl}
        gamma = np.asarray(numeric.calculate_decay_amplitudes(
            pulse, S, omega))
        print(f'decay amplitudes shape {gamma.shape}')

        # Second-order Magnus contribution: frequency shifts Delta
        delta = np.asarray(numeric.calculate_frequency_shifts(
            pulse, S, omega))
        print(f'frequency shifts shape {delta.shape}')

        # Cumulant function K and the error transfer matrix exp(K).
        K1 = np.asarray(numeric.calculate_cumulant_function(
            pulse, S, omega, second_order=False))
        U1 = np.asarray(ff.error_transfer_matrix(pulse, S, omega))
        U2 = np.asarray(ff.error_transfer_matrix(pulse, S, omega,
                                                 second_order=True))
        print(f'cumulant K shape {K1.shape}; '
              f'second-order shift of exp(K): '
              f'{np.abs(U2 - U1).max():.3e}')

        # The error transfer matrix is a quantum map: check complete
        # positivity of the full process exp(K) @ Liouville(Q).
        total = U2 @ np.asarray(pulse.total_propagator_liouville)
        cp = superoperator.liouville_is_CP(total, pulse.basis)
        print(f'full process completely positive: {bool(np.asarray(cp))}')

        # Leading-order infidelity is tr(Gamma_alpha)/d summed over
        # noise operators.
        infid = np.asarray(ff.infidelity(pulse, S, omega)).sum()
        approx = gamma.trace(axis1=-2, axis2=-1).sum().real / pulse.d
        print(f'infidelity {infid:.3e} vs Gamma-trace identity '
              f'{approx:.3e}')


if __name__ == '__main__':
    main()
