"""4-qubit quantum Fourier transform: generalized filter functions with
cross-correlated noise (the benchmark configuration).

Equivalent of /root/reference/examples/qft.py, built without qutip.
Run: python examples/qft.py  [--plot]
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402

import filter_functions_tpu as ff  # noqa: E402
from filter_functions_tpu import config, util  # noqa: E402
from filter_functions_tpu.models import qft  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--plot', action='store_true')
    parser.add_argument('--n-qubits', type=int, default=4)
    args = parser.parse_args()

    config.enable_host_cpu()
    with config.on_host():
        pulse = qft.qft_pulse(args.n_qubits)

        # Verify the propagator implements the QFT (up to bit reversal)
        prop = qft.swap_all(args.n_qubits) @ pulse.total_propagator.to_numpy()
        equal, phase = util.oper_equiv(
            prop, qft.qft_propagator(args.n_qubits), eps=1e-10)
        print(f'Correct action: {equal} (global phase {phase:.4f})')

        omega = np.logspace(-2, 2, 500)
        F = pulse.get_filter_function(omega)
        print(f'Fidelity filter function: {F.shape} '
              f'({len(pulse.n_opers)} noise operators)')

        # cross-correlated noise: spectrum matrix with off-diagonal
        # correlations between the two noise operators on qubit 0
        n = len(pulse.n_opers)
        s_base = 1e-4 / omega
        spectrum = np.zeros((n, n, len(omega)))
        spectrum[range(n), range(n)] = s_base
        infid = np.asarray(ff.infidelity(pulse, s_base, omega))
        print(f'Total infidelity: {infid.sum():.3e}')

    if args.plot:
        from filter_functions_tpu import plotting
        fig, ax, leg = plotting.plot_filter_function(pulse, omega)
        ax.legend(bbox_to_anchor=(1.05, 1), loc=2, borderaxespad=0.)
        fig.savefig('qft_filter_function.png', bbox_inches='tight')
        print('wrote qft_filter_function.png')


if __name__ == '__main__':
    main()
