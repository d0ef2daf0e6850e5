"""Noise spectroscopy: reconstruct S(omega) from measured infidelities.

The Alvarez-Suter protocol in filter-function language: CPMG trains of
varying period probe the spectrum at their harmonics; collecting the
measured infidelities I_p = 1/(2 pi d) int F_p S turns spectrum
estimation into a linear inverse problem solved here by jitted
non-negative least squares (no reference-package equivalent).

Run: python examples/noise_spectroscopy.py
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import filter_functions_tpu as ff
from filter_functions_tpu import spectroscopy, util

X, Z = util.paulis[1], util.paulis[3]


def cpmg_pulse(n, tau):
    """n-pulse CPMG train of total duration tau with Z dephasing."""
    delta = np.array([0] + [(g - 0.5) / n for g in range(1, n + 1)])
    tau_pi = 1e-4
    s, t = np.array([]), np.array([0.0])
    for i in range(len(delta) - 1):
        s = np.append(s, np.pi / tau_pi * np.array([0, 1]))
        t = np.append(t, tau_pi * np.array([0, 1])
                      + (delta * tau)[i + 1] - tau_pi / 2)
    t = np.append(t, tau)
    s = np.append(s, 0)
    return ff.PulseSequence([[X / 2, s]],
                            [[Z / 2, np.ones_like(np.diff(t))]],
                            np.diff(t))


def main():
    # --- the "experiment": a family of CPMG trains -----------------------
    taus = np.geomspace(0.3, 30, 16)
    pulses = [cpmg_pulse(8, tau) for tau in taus]
    omega = np.geomspace(2e-1, 2e2, 400)
    ffs = np.stack([p.get_filter_function(omega).to_numpy()[0, 0].real
                    for p in pulses])

    # --- synthetic ground truth and "measured" infidelities --------------
    rng = np.random.default_rng(0)
    s_model = 1e-3 / omega**0.7 + 5e-6 / (1 + (omega - 20)**2)  # 1/f + peak
    measured = np.array([
        float(np.asarray(ff.infidelity(p, s_model, omega))[0])
        for p in pulses])
    measured *= 1 + 0.02 * rng.standard_normal(len(measured))  # shot noise

    # --- reconstruction --------------------------------------------------
    a, nodes = spectroscopy.design_matrix(ffs, omega, n_nodes=12)
    s_nodes = spectroscopy.reconstruct(a, measured, ridge=1e-9,
                                       curvature=1e-8)
    s_hat = np.asarray(spectroscopy.interpolate_spectrum(s_nodes, nodes,
                                                         omega))

    resid = np.asarray(a) @ np.asarray(s_nodes) - measured
    print(f'{len(pulses)} pulses, {len(nodes)} spectrum nodes')
    print(f'measurement fit residual (rel): '
          f'{np.abs(resid / measured).max():.2e}')
    interior = (omega > nodes[1]) & (omega < nodes[-2])
    rel = np.abs(s_hat[interior] / s_model[interior] - 1)
    print(f'spectrum recovery, interior median rel err: '
          f'{np.median(rel):.2%}')

    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        ax.loglog(omega, s_model, label='true S(omega)')
        ax.loglog(omega, s_hat, '--', label='reconstructed')
        ax.loglog(nodes, np.asarray(s_nodes), 'o', ms=4, label='nodes')
        ax.set_xlabel(r'$\omega$')
        ax.set_ylabel(r'$S(\omega)$')
        ax.legend()
        fig.savefig('/tmp/noise_spectroscopy.png', dpi=100)
        print('wrote /tmp/noise_spectroscopy.png')
    except ImportError:
        pass


if __name__ == '__main__':
    main()
