"""Periodic driving: the three ways to compute the filter function of a
pulse repeated 10^4 times, from slowest to fastest.

Equivalent of the reference's periodic_driving notebook (the timings
there: 38.4 s brute force / 0.90 s standard / 0.055 s periodic on the
reference's machine).

Run: python examples/periodic_driving.py [--repeats 10000]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import filter_functions_tpu as ff  # noqa: E402
from filter_functions_tpu import config, util  # noqa: E402


def make_not_pulse(segments: int = 20):
    """A resonantly driven NOT gate, rotating-frame Hamiltonian."""
    I, X, Y, Z = util.paulis
    amp = np.pi / segments
    H_c = [[X / 2, np.full(segments, amp), 'X']]
    H_n = [[Z / 2, np.ones(segments), 'Z']]
    dt = np.full(segments, 1.0 / segments)
    return ff.PulseSequence(H_c, H_n, dt)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--repeats', type=int, default=10_000)
    parser.add_argument('--brute-force', action='store_true',
                        help='also run the from-scratch computation over '
                             'all repeats*segments segments')
    args = parser.parse_args()

    config.enable_host_cpu()
    with config.on_host():
        atomic = make_not_pulse()
        omega = util.get_sample_frequencies(atomic, n_samples=400,
                                            spacing='log')

        t0 = time.perf_counter()
        atomic.cache_filter_function(omega)
        print(f'ATOMIC filter function:      '
              f'{time.perf_counter() - t0:8.4f} s')

        t0 = time.perf_counter()
        periodic = ff.concatenate_periodic(atomic, args.repeats)
        print(f'PERIODIC (closed form):      '
              f'{time.perf_counter() - t0:8.4f} s')

        t0 = time.perf_counter()
        standard = ff.concatenate([atomic] * args.repeats)
        print(f'STANDARD concatenate:        '
              f'{time.perf_counter() - t0:8.4f} s')

        f_per = periodic.get_filter_function(omega).to_numpy()
        f_std = standard.get_filter_function(omega).to_numpy()
        print(f'periodic vs standard max |diff|: '
              f'{np.abs(f_per - f_std).max():.3e}')

        if args.brute_force:
            t0 = time.perf_counter()
            brute = ff.concatenate_without_filter_function(
                [atomic] * args.repeats)
            f_brute = brute.get_filter_function(omega).to_numpy()
            print(f'BRUTE FORCE from scratch:    '
                  f'{time.perf_counter() - t0:8.4f} s   '
                  f'(max |diff| {np.abs(f_per - f_brute).max():.3e})')


if __name__ == '__main__':
    main()
