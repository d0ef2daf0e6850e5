"""Extending pulses: map single-qubit pulses onto a multi-qubit
register, reusing cached filter functions, and permute qubit order.

Equivalent of the reference's extending_pulses notebook
(/root/reference/doc/source/examples/extending_pulses.ipynb).

Run: python examples/extending_pulses.py
"""
import sys
import time
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
        segments = 20
        dt = np.full(segments, 1.0 / segments)

        # Single-qubit primitives with dephasing noise, Pauli basis
        # (extension requires a separable basis).
        not_q = ff.PulseSequence(
            [[X / 2, np.full(segments, pi), 'X']],
            [[Z / 2, np.ones(segments), 'Z']],
            dt, basis=ff.Basis.pauli(1))
        idle = ff.PulseSequence(
            [[X / 2, np.zeros(segments), 'X']],
            [[Z / 2, np.ones(segments), 'Z']],
            dt, basis=ff.Basis.pauli(1))

        omega = util.get_sample_frequencies(not_q, n_samples=200)
        not_q.cache_filter_function(omega)
        idle.cache_filter_function(omega)

        # NOT on qubit 0, idle on qubit 1 -> two-qubit pulse; cached
        # filter functions are scaled + scattered, not recomputed.
        t0 = time.perf_counter()
        two_qubit = ff.extend([(not_q, 0, {'X': 'X_0', 'Z': 'Z_0'}),
                               (idle, 1, {'X': 'X_1', 'Z': 'Z_1'})])
        t_ext = time.perf_counter() - t0
        print(f'extend with cache reuse:  {t_ext:7.4f} s '
              f'(FF cached: {two_qubit.is_cached("filter function")})')
        print(f'd = {two_qubit.d}, noise opers: '
              f'{two_qubit.n_oper_identifiers.tolist()}')

        # Validate against the explicitly built register.
        H_c = [[util.tensor(X / 2, I), np.full(segments, pi), 'X_0'],
               [util.tensor(I, X / 2), np.zeros(segments), 'X_1']]
        H_n = [[util.tensor(Z / 2, I), np.ones(segments), 'Z_0'],
               [util.tensor(I, Z / 2), np.ones(segments), 'Z_1']]
        explicit = ff.PulseSequence(H_c, H_n, dt, basis=ff.Basis.pauli(2))
        f_ext = two_qubit.get_filter_function(omega).to_numpy()
        f_exp = explicit.get_filter_function(omega).to_numpy()
        print(f'extended vs explicit max |diff|: '
              f'{np.abs(f_ext - f_exp).max():.3e}')

        # Additional entangling noise on the extended register:
        with_zz = ff.extend(
            [(not_q, 0, {'X': 'X_0', 'Z': 'Z_0'}),
             (idle, 1, {'X': 'X_1', 'Z': 'Z_1'})],
            additional_noise_Hamiltonian=[
                [util.tensor(Z, Z) / 4, np.ones(segments), 'ZZ']])
        print(f'with ZZ noise: {with_zz.n_oper_identifiers.tolist()}')

        # remap: permute the qubit order; the cached control matrix
        # follows by index permutation of the Pauli basis.  Relabeling
        # qubits leaves each identifier's filter function invariant.
        swapped = ff.remap(two_qubit, (1, 0))
        f_swap = swapped.get_filter_function(omega).to_numpy()
        print(f'remap keeps FF cached: '
              f'{swapped.is_cached("filter function")}; '
              f'per-identifier FFs invariant: '
              f'{np.allclose(f_swap, f_ext, atol=1e-14)}')


if __name__ == '__main__':
    main()
