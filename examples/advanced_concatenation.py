"""Advanced concatenation: spin echo from primitive pulses, cache
reuse, and pulse-correlation filter functions.

Equivalent of the reference's advanced_concatenation notebook
(/root/reference/doc/source/examples/advanced_concatenation.ipynb).

Run: python examples/advanced_concatenation.py
"""
import sys
import time
from math import pi
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import filter_functions_tpu as ff  # noqa: E402
from filter_functions_tpu import config, util  # noqa: E402


def make_pulses(tau: float = 10.0, segments: int = 50):
    """free evolution, and a primitive pi_x pulse of the same length."""
    I, X, Y, Z = util.paulis
    dt = np.full(segments, tau / segments)
    wait = ff.PulseSequence([[X / 2, np.zeros(segments), 'X']],
                            [[Z / 2, np.ones(segments), 'Z']], dt)
    pi_x = ff.PulseSequence([[X / 2, np.full(segments, pi / tau), 'X']],
                            [[Z / 2, np.ones(segments), 'Z']], dt)
    return wait, pi_x


def main():
    config.enable_host_cpu()
    with config.on_host():
        wait, pi_x = make_pulses()
        omega = util.get_sample_frequencies(wait, n_samples=400)

        # Cache the atomic filter functions once ...
        t0 = time.perf_counter()
        wait.cache_filter_function(omega)
        pi_x.cache_filter_function(omega)
        print(f'atomic FFs:          {time.perf_counter() - t0:7.4f} s')

        # ... then every composite pulse reuses them.
        t0 = time.perf_counter()
        echo = wait @ pi_x @ wait
        print(f'echo = w @ pi @ w:   {time.perf_counter() - t0:7.4f} s '
              f'(cached: {echo.is_cached("filter function")})')

        # The cached result equals the from-scratch one.
        scratch = ff.concatenate_without_filter_function(
            [wait, pi_x, wait])
        f_cached = echo.get_filter_function(omega).to_numpy()
        f_scratch = scratch.get_filter_function(omega).to_numpy()
        print(f'cached vs scratch max |diff|: '
              f'{np.abs(f_cached - f_scratch).max():.3e}')

        # Pulse-correlation filter functions F^(gg') resolve which
        # *interference terms* between the constituent pulses contribute.
        echo_pc = ff.concatenate([wait, pi_x, wait],
                                 calc_pulse_correlation_FF=True,
                                 omega=omega)
        f_pc = echo_pc.get_pulse_correlation_filter_function().to_numpy()
        print(f'F^(gg\') shape: {f_pc.shape}')
        total = f_pc.sum(axis=(0, 1)).real
        print(f'sum over g,g\' equals total FF: '
              f'{np.allclose(total, f_cached.real, atol=1e-12)}')

        # Infidelity attribution per pulse pair for 1/f noise:
        S = 1e-4 / omega
        infid_pc = np.asarray(ff.infidelity(echo_pc, S, omega,
                                            which='correlations'))
        print('per-(g,g\') infidelity contributions:')
        print(infid_pc.squeeze().round(9))
        print(f'total = {infid_pc.sum():.3e}')


if __name__ == '__main__':
    main()
