"""Noise spectroscopy: recover a known spectrum from synthetic
infidelities of a CPMG pulse family (the Alvarez-Suter protocol in
filter-function language; no reference-package equivalent)."""
import numpy as np
import pytest

import filter_functions_tpu as ff
from filter_functions_tpu import spectroscopy, util
from testutil import assert_allclose, generate_dd_hamiltonian, sigma, to_np


def _cpmg_family(taus, n=8):
    pulses = []
    for tau in taus:
        H_c, dt = generate_dd_hamiltonian(n, tau=tau, tau_pi=1e-4,
                                          dd_type='cpmg')
        H_n = [[sigma[3] / 2, np.ones_like(dt)]]
        pulses.append(ff.PulseSequence(H_c, H_n, dt))
    return pulses


@pytest.fixture(scope='module')
def cpmg_setup():
    taus = np.geomspace(0.3, 30, 16)
    pulses = _cpmg_family(taus)
    omega = np.geomspace(2e-1, 2e2, 400)
    ffs = np.stack([to_np(p.get_filter_function(omega))[0, 0].real
                    for p in pulses])
    return pulses, omega, ffs


class TestSpectroscopy:
    def test_basis_partition_of_unity(self):
        omega = np.geomspace(0.1, 100, 57)
        nodes, w = spectroscopy.spectrum_basis(omega, 9)
        assert w.shape == (9, 57)
        # hat functions sum to one everywhere inside the node range
        assert_allclose(w.sum(axis=0), 1.0, atol=1e-12)
        # interpolating nodal values reproduces a log-linear function
        s_nodes = 2.0 + np.log(nodes)
        got = np.asarray(spectroscopy.interpolate_spectrum(
            s_nodes, nodes, omega))
        assert_allclose(got, 2.0 + np.log(omega), atol=1e-12)

    def test_basis_validation(self):
        omega = np.geomspace(0.1, 100, 17)
        with pytest.raises(ValueError, match='n_nodes'):
            spectroscopy.spectrum_basis(omega, 1)
        with pytest.raises(ValueError, match='[Dd]egenerate'):
            spectroscopy.spectrum_basis(np.full(5, 2.0), 4)
        with pytest.raises(ValueError, match='[Dd]egenerate'):
            spectroscopy.spectrum_basis(omega, 4, omega_min=5.0,
                                        omega_max=5.0)

    def test_reconstruct_zero_row_guard(self):
        # A pulse whose filter function misses every basis hat yields a
        # zero design-matrix row; the solve must stay finite.
        a = np.array([[1.0, 0.5, 0.0],
                      [0.0, 0.0, 0.0],
                      [0.2, 1.0, 0.3]])
        y = np.array([1.0, 0.0, 0.8])
        s = np.asarray(spectroscopy.reconstruct(a, y, n_steps=200))
        assert np.isfinite(s).all()
        assert (s >= 0).all()

    def test_design_matrix_forward_consistency(self, cpmg_setup):
        """A @ s_nodes equals directly integrated infidelities for a
        spectrum living exactly in the interpolation basis."""
        pulses, omega, ffs = cpmg_setup
        a, nodes = spectroscopy.design_matrix(ffs, omega, n_nodes=10)
        s_nodes = 1e-3 / nodes**0.7
        spectrum = np.asarray(spectroscopy.interpolate_spectrum(
            s_nodes, nodes, omega))
        want = np.array([
            float(np.asarray(ff.infidelity(p, spectrum, omega))[0])
            for p in pulses])
        got = np.asarray(a) @ s_nodes
        assert_allclose(got, want, rtol=1e-10)

    def test_recover_power_law(self, cpmg_setup):
        """Reconstruct S ~ 1/omega^0.7 from synthetic measurements."""
        pulses, omega, ffs = cpmg_setup
        a, nodes = spectroscopy.design_matrix(ffs, omega, n_nodes=10)
        s_true = 1e-3 / nodes**0.7
        infids = np.asarray(a) @ s_true
        s_hat = np.asarray(spectroscopy.reconstruct(a, infids,
                                                    ridge=1e-10))
        assert (s_hat >= 0).all()
        # fit quality: the forward model reproduces the measurements
        assert_allclose(np.asarray(a) @ s_hat, infids, rtol=1e-3)
        # the spectrum itself is recovered where the pulses have
        # support (interior nodes)
        interior = slice(1, -2)
        assert_allclose(s_hat[interior], s_true[interior], rtol=0.15)

    def test_recover_with_noise_and_regularization(self, cpmg_setup):
        pulses, omega, ffs = cpmg_setup
        a, nodes = spectroscopy.design_matrix(ffs, omega, n_nodes=10)
        s_true = 1e-3 / nodes**0.7
        local = np.random.default_rng(11)
        infids = np.asarray(a) @ s_true
        noisy = infids * (1 + 0.01 * local.standard_normal(len(infids)))
        s_hat = np.asarray(spectroscopy.reconstruct(
            a, noisy, ridge=1e-9, curvature=1e-7))
        assert (s_hat >= 0).all()
        interior = slice(1, -2)
        assert_allclose(s_hat[interior], s_true[interior], rtol=0.5)
