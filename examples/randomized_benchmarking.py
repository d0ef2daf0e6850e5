"""Randomized benchmarking: filter-function infidelities of random
Clifford sequences vs sequence length.

Equivalent of /root/reference/examples/randomized_benchmarking.py
(24 Cliffords x lengths x samples), exploiting concatenation cache
reuse: each Clifford's control matrix is computed once and reused for
every sequence.

Run: python examples/randomized_benchmarking.py [--lengths 1 5 10]
     [--samples 10]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import filter_functions_tpu as ff  # noqa: E402
from filter_functions_tpu import config, util  # noqa: E402
from filter_functions_tpu.models import rb  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--lengths', type=int, nargs='+',
                        default=[1, 2, 5, 10, 20])
    parser.add_argument('--samples', type=int, default=10)
    parser.add_argument('--n-omega', type=int, default=301)
    args = parser.parse_args()

    config.enable_host_cpu()
    rng = np.random.default_rng(2024)
    with config.on_host():
        pulses = rb.clifford_pulses()
        omega = util.get_sample_frequencies(pulses[0],
                                            n_samples=args.n_omega)
        t0 = time.perf_counter()
        for p in pulses:
            p.cache_filter_function(omega)
        print(f'cached 24 Clifford control matrices in '
              f'{time.perf_counter() - t0:.2f} s')

        spectrum = 1e-4 / omega  # 1/f dephasing

        print(f'{"m":>4} {"mean infid":>12} {"std":>12} {"time/seq":>10}')
        for m in args.lengths:
            infids = []
            t0 = time.perf_counter()
            for _ in range(args.samples):
                idx, rec = rb.sample_sequence(m, rng)
                seq = rb.rb_pulse(idx, rec, pulses)
                infids.append(float(np.asarray(
                    ff.infidelity(seq, spectrum, omega)).sum()))
            per_seq = (time.perf_counter() - t0) / args.samples
            print(f'{m:>4} {np.mean(infids):>12.3e} '
                  f'{np.std(infids):>12.3e} {per_seq:>9.3f}s')


if __name__ == '__main__':
    main()
