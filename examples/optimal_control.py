"""Optimal control: shape a pulse to minimize noise-induced
infidelity with the on-device GRAPE loop, cross-checking the analytic
filter-function gradient against autodiff.

The gradient formalism is the subject of Le et al., PRApplied 17,
024006 (2022) (reference gradient.py); the reference package exposes
the derivative for external optimizers, while here the whole
optimization runs on the accelerator.

Run: python examples/optimal_control.py [--steps 300]
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import filter_functions_tpu as ff  # noqa: E402
from filter_functions_tpu import config, functional, gradient, parallel, util  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--steps', type=int, default=300)
    parser.add_argument('--segments', type=int, default=16)
    args = parser.parse_args()

    config.enable_host_cpu()
    with config.on_host():
        I, X, Y, Z = util.paulis
        n_dt = args.segments
        rng = np.random.default_rng(0)
        dt = np.full(n_dt, 1.0 / n_dt)

        # start from a noisy X-rotation attempt
        c0 = np.pi + 0.3 * rng.standard_normal((2, n_dt))
        pulse = ff.PulseSequence(
            [[X / 2, c0[0], 'X'], [Y / 2, c0[1], 'Y']],
            [[Z / 2, np.ones(n_dt), 'Z']], dt,
            basis=ff.Basis.pauli(1))
        omega = util.get_sample_frequencies(pulse, n_samples=200)
        S = 1e-3 / np.asarray(omega)

        # 1. the analytic derivative the reference exposes ...
        dI = np.asarray(gradient.infidelity_derivative(pulse, S, omega))
        # 2. ... equals jax.grad through the functional pipeline
        p = functional.make_pulse_arrays(pulse)

        def loss(c):
            return functional.infidelity(
                p._replace(c_coeffs=c), jnp.asarray(S),
                jnp.asarray(omega)).sum()

        g = np.asarray(jax.grad(loss)(p.c_coeffs))
        # dI has shape (n_nops, n_dt, n_ctrl); sum noise axis, transpose
        closed = dI.sum(axis=0).T
        rel = np.abs(closed - g).max() / np.abs(g).max()
        print(f'analytic vs autodiff gradient: rel diff {rel:.2e}')

        # 3. multi-start GRAPE: batch of perturbed candidates
        batch = 8
        cb = jnp.asarray(c0)[None] * (
            1 + 0.2 * rng.standard_normal((batch, 1, 1)))
        res = parallel.optimize_pulse(
            p._replace(c_coeffs=cb), S, omega, n_steps=args.steps,
            learning_rate=2e-2)
        best = int(np.argmin(np.asarray(res.infidelity)))
        print(f'initial loss {float(res.history[0]):.3e} -> final '
              f'{float(res.history[-1]):.3e} over {args.steps} steps')
        print(f'best candidate #{best}: infidelity '
              f'{float(res.infidelity[best]):.3e}')

        # the optimized pulse, back in the object API
        optimized = ff.PulseSequence(
            [[X / 2, np.asarray(res.c_coeffs[best, 0]), 'X'],
             [Y / 2, np.asarray(res.c_coeffs[best, 1]), 'Y']],
            [[Z / 2, np.ones(n_dt), 'Z']], dt, basis=ff.Basis.pauli(1))
        infid0 = np.asarray(ff.infidelity(pulse, S, omega)).sum()
        infid1 = np.asarray(ff.infidelity(optimized, S, omega)).sum()
        print(f'infidelity: {infid0:.3e} (initial) -> {infid1:.3e} '
              f'(optimized), {infid0 / infid1:.1f}x lower')


if __name__ == '__main__':
    main()
