"""Precision tests against analytic closed forms and the reference
implementation (mirrors the strategy of the reference's
tests/test_precision.py: atol 1e-10 parity with FID/SE/CPMG/UDD/PDD/CDD,
frequency-integral checks against dense quadrature, and the CNOT golden
data)."""
import numpy as np
import pytest

import filter_functions_tpu as ff
from filter_functions_tpu import analytic, cplx, numeric
from conftest import HAVE_REFERENCE
from testutil import (assert_allclose, cnot_data, generate_dd_hamiltonian,
                      rng, sigma, to_np)


def dephasing_pulse_ff(H_c, dt, omega, n_coeff=None):
    """Filter function of an X-drive pulse with sigma_z/2 dephasing."""
    n_dt = len(dt)
    H_n = [[sigma[3] / 2, np.ones(n_dt) if n_coeff is None else n_coeff]]
    pulse = ff.PulseSequence(H_c, H_n, dt)
    return to_np(pulse.get_filter_function(omega))[0, 0].real


class TestAnalyticFilterFunctions:
    """Numeric FF == closed forms x 1/omega^2 at atol 1e-10
    (cf. reference test_precision.py:75-183)."""

    def test_fid(self):
        tau = 0.5 + rng.random()
        omega = np.linspace(0.1, 50 / tau, 1000)
        pulse = ff.PulseSequence([[sigma[3] / 2, [0.0], 'Z']],
                                 [[sigma[3] / 2, [1.0]]], [tau])
        got = to_np(pulse.get_filter_function(omega))[0, 0].real
        want = analytic.FID(omega * tau) / omega**2
        assert_allclose(got, want, rtol=0, atol=1e-10)

    def test_spin_echo(self):
        tau = np.pi
        tau_pi = 1e-8
        n = 1
        H_c, dt = generate_dd_hamiltonian(n, tau=tau, tau_pi=tau_pi,
                                          dd_type='cpmg')
        omega = np.logspace(0, 2, 200)
        got = dephasing_pulse_ff(H_c, dt, omega)
        want = analytic.SE(omega * tau) / omega**2
        assert_allclose(got, want, rtol=0, atol=1e-10)

    @pytest.mark.parametrize('n', [4, 5])
    def test_cpmg(self, n):
        tau = np.pi
        H_c, dt = generate_dd_hamiltonian(n, tau=tau, tau_pi=1e-9,
                                          dd_type='cpmg')
        omega = np.logspace(0, 2, 200)
        got = dephasing_pulse_ff(H_c, dt, omega)
        want = analytic.CPMG(omega * tau, n) / omega**2
        assert_allclose(got, want, rtol=0, atol=1e-10)

    @pytest.mark.parametrize('n', [4, 5])
    def test_udd(self, n):
        tau = np.pi
        omega = np.logspace(0, 3, 100)
        H_c, dt = generate_dd_hamiltonian(n, tau=tau, tau_pi=1e-9,
                                          dd_type='udd')
        got = dephasing_pulse_ff(H_c, dt, omega)
        want = analytic.UDD(omega * tau, n) / omega**2
        assert_allclose(got, want, rtol=0, atol=1e-10)

    @pytest.mark.parametrize('n', [4, 5])
    def test_pdd(self, n):
        tau = np.pi
        omega = np.logspace(0, 3, 100)
        H_c, dt = generate_dd_hamiltonian(n, tau=tau, tau_pi=1e-9,
                                          dd_type='pdd')
        got = dephasing_pulse_ff(H_c, dt, omega)
        want = analytic.PDD(omega * tau, n) / omega**2
        assert_allclose(got, want, rtol=0, atol=1e-10)

    @pytest.mark.parametrize('g', [2, 3])
    def test_cdd(self, g):
        tau = np.pi
        omega = np.logspace(0, 3, 100)
        H_c, dt = generate_dd_hamiltonian(g, tau=tau, tau_pi=1e-9,
                                          dd_type='cdd')
        got = dephasing_pulse_ff(H_c, dt, omega)
        want = analytic.CDD(omega * tau, g) / omega**2
        assert_allclose(got, want, rtol=0, atol=1e-10)


class TestIntegralsAgainstQuadrature:
    """K1/K2/K3 frequency integrals vs dense trapezoid quadrature on a
    fine time grid (cf. reference test_precision.py:355-468)."""

    def setup_method(self):
        self.d = 3
        self.dt = 0.5 + rng.random()
        eigvals = rng.standard_normal(self.d) * 3
        self.eigvals = np.sort(eigvals)
        self.omega = np.concatenate([
            np.linspace(0.5, 20, 13),
            [0.0],
            -self.eigvals[1] + self.eigvals[0:1],  # hit omega = -Omega_mn
        ])
        self.tgrid = np.linspace(0, self.dt, 6001)

    def test_first_order(self):
        got = numeric._first_order_integral_batched(
            cplx.jnp.asarray(self.omega), cplx.jnp.asarray(self.eigvals),
            cplx.jnp.asarray(self.dt))
        got = to_np(got)
        dE = np.subtract.outer(self.eigvals, self.eigvals)
        for o, w in enumerate(self.omega):
            phase = np.exp(1j * (w + dE[None]) * self.tgrid[:, None, None])
            want = np.trapezoid(phase, self.tgrid, axis=0)
            # trapezoid discretization error scales with (phi*dt/N)^2
            tol = max(1e-7, 1e-1 * (np.abs(w + dE).max() * self.dt
                                    / len(self.tgrid))**2)
            assert_allclose(got[o], want, atol=tol)

    @pytest.mark.skipif(not HAVE_REFERENCE, reason='reference unavailable')
    def test_first_order_reference_parity(self):
        import filter_functions.numeric as ref_numeric
        got = to_np(numeric._first_order_integral_batched(
            cplx.jnp.asarray(self.omega), cplx.jnp.asarray(self.eigvals),
            cplx.jnp.asarray(self.dt)))
        exp_buf = np.empty((len(self.omega), self.d, self.d), complex)
        int_buf = np.empty_like(exp_buf)
        want = ref_numeric._first_order_integral(
            self.omega, self.eigvals, self.dt, exp_buf, int_buf)
        assert_allclose(got, want, atol=1e-14)

    def test_second_order(self):
        got = to_np(numeric._second_order_integral_single(
            cplx.jnp.asarray(self.omega), cplx.jnp.asarray(self.eigvals),
            float(self.dt)))
        dE = np.subtract.outer(self.eigvals, self.eigvals)
        t = self.tgrid
        # I_ijmn = int_0^dt dt1 e^{i(O_ij - w) t1} int_0^t1 dt2
        #          e^{i(O_mn + w) t2}
        for o, w in enumerate(self.omega[:6]):
            inner = np.concatenate([
                np.zeros((1, self.d, self.d)),
                np.cumsum((np.exp(1j * (w + dE[None]) * t[:-1, None, None])
                           + np.exp(1j * (w + dE[None])
                                    * t[1:, None, None])) / 2
                          * np.diff(t)[:, None, None], axis=0)])
            outer = np.exp(1j * (dE[None] - w) * t[:, None, None])
            integrand = outer[:, :, :, None, None] \
                * inner[:, None, None, :, :]
            want = np.trapezoid(integrand, t, axis=0)
            assert_allclose(got[o], want, atol=5e-6,
                            err_msg=f'omega={w}')

    def test_derivative_integral(self):
        from filter_functions_tpu import gradient
        got = to_np(gradient._derivative_integral(
            cplx.jnp.asarray(self.omega), cplx.jnp.asarray(self.eigvals),
            float(self.dt)))
        dE = np.subtract.outer(self.eigvals, self.eigvals)
        t = self.tgrid
        # Quadrature form matching the reference's definition
        # (gradient.py:69-108):
        #   I = int_0^dt e^{iyt} phi_pq(t) dt,
        #   phi_pq(t) = i (1 - e^{i O_pq t}) / O_pq   (-> t as O_pq -> 0)
        # with y = omega + Omega_mn.
        for o, w in enumerate(self.omega[:6]):
            y = w + dE
            for p in range(self.d):
                for q in range(self.d):
                    opq = dE[p, q]
                    if opq != 0:
                        factor = 1j * (1 - np.exp(1j * opq * t)) / opq
                    else:
                        factor = t.astype(complex)
                    integrand = np.exp(
                        1j * y[None] * t[:, None, None]) \
                        * factor[:, None, None]
                    want = np.trapezoid(integrand, t, axis=0)
                    assert_allclose(got[o, p, q], want, atol=5e-6)


class TestSecondOrderAnalytic:
    """Second-order FF / frequency shifts vs closed forms for free
    induction decay (cf. reference test_precision.py:218-272)."""

    def test_fid_second_order(self):
        def FF2(omega):
            res = np.empty(np.shape(omega), complex)
            mask = omega == 0
            res[mask] = tau**2 / 2
            om = omega[~mask]
            # cancellation-safe e^{ix} - 1 = -2 sin^2(x/2) + i sin(x)
            x = -om * tau
            expm1 = -2 * np.sin(x / 2)**2 + 1j * np.sin(x)
            res[~mask] = (expm1 / (1j * om) + tau) / (1j * om)
            return res

        local = np.random.default_rng(321)
        ix = int(local.integers(1, 4))
        tau = float(local.random()) + 0.5
        pulse_piecewise = ff.PulseSequence(
            [[sigma[1] / np.sqrt(2), np.zeros(21)]],
            [[sigma[ix] / np.sqrt(2), np.ones(21)]],
            [tau / 21] * 21)
        pulse_single = ff.PulseSequence(
            [[sigma[1] / np.sqrt(2), np.zeros(1)]],
            [[sigma[ix] / np.sqrt(2), np.ones(1)]],
            [tau])
        s = float(local.random()) + 0.1

        # white-noise limit; two-sided spectrum exercises Im(F2)
        from filter_functions_tpu import util
        omega = util.get_sample_frequencies(pulse_piecewise, 501)
        omega = np.concatenate([-omega[::-1], [0], omega])
        spect = np.full_like(omega, s**2)
        d_pw = np.asarray(numeric.calculate_frequency_shifts(
            pulse_piecewise, spect, omega))
        d_single = np.asarray(numeric.calculate_frequency_shifts(
            pulse_single, spect, omega))
        f2 = to_np(pulse_single.get_filter_function(omega, order=2))
        mask = np.zeros_like(d_single, dtype=bool)
        mask[0, ix, ix] = True

        assert_allclose(d_single, d_pw, atol=1e-13)
        assert_allclose(d_single[mask], s**2 * tau / 2, rtol=1e-3)
        assert_allclose(d_single[~mask], 0, atol=1e-12)
        assert_allclose(f2[0, 0, ix, ix, 502:], FF2(omega[502:]),
                        atol=2e-12)
        # the imaginary part must integrate to zero over a symmetric grid
        assert_allclose(np.trapezoid(f2.imag, omega, axis=-1), 0,
                        atol=1e-13)

        # quasistatic limit: delta spike at omega = 0
        omega = np.array([-1e-15, 0, 1e-15]) / tau
        spect = 2 * np.pi * s**2 * np.array([0, 1 / omega[-1], 0])
        d_pw = np.asarray(numeric.calculate_frequency_shifts(
            pulse_piecewise, spect, omega))
        d_single = np.asarray(numeric.calculate_frequency_shifts(
            pulse_single, spect, omega))
        f2 = to_np(pulse_single.get_filter_function(omega, order=2))
        assert_allclose(d_single, d_pw, atol=1e-13)
        assert_allclose(d_single[mask], s**2 * tau**2 / 2, rtol=1e-10)
        assert_allclose(d_single[~mask], 0, atol=1e-12)
        # At omega ~ 1e-15 the FF2 closed form suffers catastrophic
        # cancellation in (expm1/(i w) + tau); compare against the
        # analytic quasistatic limit tau^2/2 - i w tau^3/6 instead.
        assert_allclose(f2[0, 0, ix, ix, 2], tau**2 / 2, atol=1e-12)


class TestErrorTransferSelfConsistency:
    """error_transfer_matrix vs the on-foot trace contraction and the
    infidelity (cf. reference test_precision.py:631-727).  These checks
    are internal consistency -- they pin the d=2 fast path against the
    general four_element_traces formula."""

    @pytest.mark.parametrize('d,n_dt,btype', [(2, 4, 'Pauli'), (2, 1, 'Pauli'),
                                              (3, 2, 'GGM'), (4, 2, 'GGM')])
    def test_transfer_matrix_on_foot(self, d, n_dt, btype):
        from scipy import linalg as sla
        from testutil import rand_pulse_sequence
        from filter_functions_tpu import util
        pulse = rand_pulse_sequence(d, n_dt, 3, 2, btype=btype)
        omega = util.get_sample_frequencies(pulse, n_samples=51)
        traces = pulse.basis.four_element_traces

        s_one = 1e-8 / omega**2
        spectra = [
            s_one,
            np.outer(1e-6 * np.arange(1, 3), 400 / (omega**2 + 400)),
            np.array([[1e-6 / omega, 1e-8 / omega + 1j * 1e-8 / omega],
                      [1e-8 / omega - 1j * 1e-8 / omega, 2e-6 / omega]]),
        ]
        for S in spectra:
            U = np.asarray(ff.error_transfer_matrix(pulse, S, omega))
            Up = np.asarray(ff.error_transfer_matrix(
                pulse, S, omega, memory_parsimonious=True))
            gamma = np.asarray(numeric.calculate_decay_amplitudes(
                pulse, S, omega))
            K = -(np.einsum('...kl,klji->...ij', gamma, traces)
                  - np.einsum('...kl,kjli->...ij', gamma, traces)
                  - np.einsum('...kl,kilj->...ij', gamma, traces)
                  + np.einsum('...kl,kijl->...ij', gamma, traces)).real / 2
            U_onfoot = sla.expm(K.sum(tuple(range(K.ndim - 2))))
            U_from_K = np.asarray(ff.error_transfer_matrix(
                cumulant_function=K))
            assert_allclose(Up, U, atol=1e-14)
            assert_allclose(U, U_onfoot, atol=1e-13)
            assert_allclose(U_from_K, U_onfoot, atol=1e-14)

            infid = np.asarray(ff.infidelity(pulse, S, omega))
            i_decay = -np.einsum('...ii', K) / d**2
            i_transfer = 1 - np.einsum('...ii', U) / d**2
            assert_allclose(infid, i_decay, atol=1e-14, rtol=1e-10)
            assert_allclose(i_transfer, infid.sum().real, rtol=1e-4,
                            atol=1e-10)

            # second order
            delta = np.asarray(numeric.calculate_frequency_shifts(
                pulse, S, omega))
            K = K - (np.einsum('...kl,klji->...ij', delta, traces)
                     - np.einsum('...kl,lkji->...ij', delta, traces)
                     - np.einsum('...kl,klij->...ij', delta, traces)
                     + np.einsum('...kl,lkij->...ij', delta, traces)
                     ).real / 2
            U2 = np.asarray(ff.error_transfer_matrix(pulse, S, omega,
                                                     second_order=True))
            U2_onfoot = sla.expm(K.sum(tuple(range(K.ndim - 2))))
            assert_allclose(U2, U2_onfoot, atol=1e-13)
            i_transfer_2 = 1 - np.einsum('...ii', U2) / d**2
            assert_allclose(i_transfer_2, infid.sum().real, rtol=1e-4,
                            atol=1e-10)

    def test_finite_trace_noise_oper(self):
        """n_oper with finite trace is an edge case of the d=2 fast
        path (reference test_precision.py:636-639)."""
        from scipy import linalg as sla
        from filter_functions_tpu import util
        from testutil import rand_pulse_arrays
        c_opers, c_ids, c_coeffs, n_opers, n_ids, n_coeffs, dt = \
            rand_pulse_arrays(2, 3, 3, 2)
        n_opers = n_opers.copy()
        n_opers[0] = np.eye(2) / np.sqrt(2)
        pulse = ff.PulseSequence(list(zip(c_opers, c_coeffs, c_ids)),
                                 list(zip(n_opers, n_coeffs, n_ids)),
                                 dt, ff.Basis.pauli(1))
        omega = util.get_sample_frequencies(pulse, n_samples=31)
        S = 1e-8 / omega**2
        U = np.asarray(ff.error_transfer_matrix(pulse, S, omega))
        traces = pulse.basis.four_element_traces
        gamma = np.asarray(numeric.calculate_decay_amplitudes(
            pulse, S, omega))
        K = -(np.einsum('...kl,klji->...ij', gamma, traces)
              - np.einsum('...kl,kjli->...ij', gamma, traces)
              - np.einsum('...kl,kilj->...ij', gamma, traces)
              + np.einsum('...kl,kijl->...ij', gamma, traces)).real / 2
        assert_allclose(U, sla.expm(K.sum(0)), atol=1e-13)

    def test_error_transfer_matrix_raises(self):
        with pytest.raises(ValueError, match='Require either'):
            ff.error_transfer_matrix()
        with pytest.raises(TypeError):
            ff.error_transfer_matrix(cumulant_function=[1, 2, 3])
        with pytest.raises(ValueError):
            ff.error_transfer_matrix(
                cumulant_function=np.zeros((2, 3)))


class TestInfidelitySweep:
    """Infidelity over the reference's spectrum-shape zoo
    (cf. test_precision.py:495-604), plus error paths."""

    SPECTRA = [
        lambda S0, omega: S0 * np.abs(omega)**0,
        lambda S0, omega: S0 / np.abs(omega)**0.7,
        lambda S0, omega: S0 * np.exp(-np.abs(omega)),
        lambda S0, omega: np.array([S0 * np.abs(omega)**0,
                                    S0 / np.abs(omega)**0.7]),
        lambda S0, omega: np.array([
            [S0 / np.abs(omega)**0.7,
             S0 / (1 + omega**2) + 1j * S0 * omega],
            [S0 / (1 + omega**2) - 1j * S0 * omega,
             S0 / np.abs(omega)**0.7]]),
    ]

    @pytest.mark.skipif(not HAVE_REFERENCE, reason='reference unavailable')
    @pytest.mark.parametrize('d', [2, 3, 4])
    def test_spectrum_shapes_vs_reference(self, d):
        import filter_functions as ref
        from testutil import pulse_pair
        ours, theirs = pulse_pair(d, 6, 2, 3)
        ids = list(ours.n_oper_identifiers[:2])
        omega = np.geomspace(0.1, 10, 51)
        S0 = 0.5
        for spec in self.SPECTRA:
            S = spec(S0, omega)
            got = np.asarray(ff.infidelity(ours, S, omega,
                                           n_oper_identifiers=ids))
            want = ref.infidelity(theirs, S, omega,
                                  n_oper_identifiers=ids)
            assert_allclose(got, want, rtol=1e-10, atol=1e-14)
            if S.ndim == 3:
                # diagonal == uncorrelated, matrix hermitian
                diag = np.asarray(ff.infidelity(
                    ours, S[range(2), range(2)], omega,
                    n_oper_identifiers=ids))
                assert_allclose(np.diag(got), diag, rtol=1e-12)
                assert_allclose(got, got.conj().T, atol=1e-15)

    def test_infidelity_raises(self):
        from testutil import rand_pulse_sequence
        pulse = rand_pulse_sequence(2, 3, 2, 2)
        omega = np.geomspace(0.1, 10, 11)
        S0 = 1.0
        with pytest.raises(ValueError):
            ff.infidelity(pulse, self.SPECTRA[0](S0, omega), omega,
                          which='monkey')
        with pytest.raises(ValueError):
            # spectrum length mismatch
            ff.infidelity(pulse, self.SPECTRA[0](S0, omega)[:5], omega)
        with pytest.raises(ValueError):
            # more identifiers than spectra
            ff.infidelity(pulse, self.SPECTRA[3](S0, omega), omega,
                          n_oper_identifiers=list(
                              pulse.n_oper_identifiers) * 2)
        with pytest.raises(ValueError):
            # 4-dimensional spectrum
            ff.infidelity(pulse, rng.standard_normal((2, 2, 2, 11)), omega)
        with pytest.raises(ValueError):
            # cross-correlated but not hermitian
            ff.infidelity(pulse, rng.standard_normal((2, 2, 11)), omega)
        with pytest.raises(ValueError):
            ff.infidelity(pulse, (1 + 1j) * rng.standard_normal((1, 1, 11)),
                          omega, n_oper_identifiers=[
                              pulse.n_oper_identifiers[0]])
        with pytest.raises(NotImplementedError):
            ff.infidelity(pulse, self.SPECTRA[4](S0, omega), omega,
                          return_smallness=True)


class TestNonTracelessInvariance:
    """Physical results must not depend on whether the basis is
    traceless (cf. reference test_precision.py:606-629)."""

    def test_traceless_vs_nontraceless(self):
        from filter_functions_tpu import util
        from testutil import rand_pulse_arrays, make_pulse
        arrays = rand_pulse_arrays(3, 3, 2, 2)
        p_traceless = make_pulse(arrays)
        p_nontraceless = make_pulse(arrays)
        p_nontraceless.basis = ff.Basis.from_partial(
            np.diag([1., 1., 0.]) / np.sqrt(2))
        assert not p_nontraceless.basis.istraceless

        omega = util.get_sample_frequencies(p_traceless, 200)
        spect = 1e-3 / omega
        i_traceless = np.asarray(ff.infidelity(p_traceless, spect, omega))
        i_nontraceless = np.asarray(ff.infidelity(p_nontraceless, spect,
                                                  omega))
        assert_allclose(i_traceless, i_nontraceless, rtol=1e-8, atol=1e-16)

        c_tl = ff.concatenate([p_traceless, p_traceless],
                              calc_pulse_correlation_FF=True, omega=omega)
        c_ntl = ff.concatenate([p_nontraceless, p_nontraceless],
                               calc_pulse_correlation_FF=True, omega=omega)
        i_tl = np.asarray(ff.infidelity(c_tl, spect, omega,
                                        which='correlations'))
        i_ntl = np.asarray(ff.infidelity(c_ntl, spect, omega,
                                         which='correlations'))
        assert_allclose(i_tl, i_ntl, rtol=1e-8, atol=1e-16)


@pytest.mark.skipif(not HAVE_REFERENCE, reason='reference unavailable')
class TestReferenceParity:
    """Direct parity with the reference package on identical inputs."""

    @pytest.mark.parametrize('d,n_dt', [(2, 5), (3, 4), (4, 6)])
    def test_control_matrix_and_ff(self, d, n_dt):
        from testutil import pulse_pair
        ours, theirs = pulse_pair(d, n_dt)
        omega = np.linspace(-10, 10, 51)
        ctrl_ours = to_np(ours.get_control_matrix(omega))
        ctrl_theirs = theirs.get_control_matrix(omega)
        assert_allclose(ctrl_ours, ctrl_theirs, atol=1e-12)
        ff_ours = to_np(ours.get_filter_function(omega, which='generalized'))
        ff_theirs = theirs.get_filter_function(omega, which='generalized')
        assert_allclose(ff_ours, ff_theirs, atol=1e-12)

    def test_infidelity(self):
        from testutil import pulse_pair
        ours, theirs = pulse_pair(3, 7)
        omega = np.linspace(0.1, 30, 201)
        spectrum = 1e-2 / omega**0.7
        i_ours = np.asarray(ff.infidelity(ours, spectrum, omega))
        import filter_functions as ref
        i_theirs = ref.infidelity(theirs, spectrum, omega)
        assert_allclose(i_ours, i_theirs, rtol=1e-12)

    def test_second_order_ff(self):
        from testutil import pulse_pair
        ours, theirs = pulse_pair(2, 4)
        omega = np.linspace(-5, 5, 21)
        got = to_np(ours.get_filter_function(omega, order=2))
        want = theirs.get_filter_function(omega, order=2)
        assert_allclose(got, want, atol=1e-12)

    def test_error_transfer_matrix(self):
        from testutil import pulse_pair
        import filter_functions as ref
        ours, theirs = pulse_pair(2, 5)
        omega = np.linspace(-10, 10, 100)  # even count: omega = 0 excluded
        spectrum = 1e-2 / np.abs(omega)**0.7
        got = np.asarray(ff.error_transfer_matrix(ours, spectrum, omega))
        want = ref.error_transfer_matrix(theirs, spectrum, omega)
        assert_allclose(got, want, atol=1e-12)
        got2 = np.asarray(ff.error_transfer_matrix(ours, spectrum, omega,
                                                   second_order=True))
        want2 = ref.error_transfer_matrix(theirs, spectrum, omega,
                                          second_order=True)
        assert_allclose(got2, want2, atol=1e-12)

    def test_cumulant_multiqubit(self):
        """d = 4 exercises the general trace-contraction path."""
        from testutil import pulse_pair
        import filter_functions as ref
        ours, theirs = pulse_pair(4, 3)
        omega = np.linspace(-5, 5, 41)
        spectrum = 1e-2 / (1 + omega**2)
        got = np.asarray(numeric.calculate_cumulant_function(
            ours, spectrum, omega))
        want = ref.numeric.calculate_cumulant_function(
            theirs, spectrum, omega)
        assert_allclose(got, want, atol=1e-12)


@pytest.mark.skipif(not HAVE_REFERENCE, reason='needs golden data')
class TestCNOTGolden:
    def test_infidelity_parity(self):
        """Infidelity of the 6-level CNOT vs MATLAB golden values
        (mirrors reference test_precision.py:274-310): qubit-subspace
        Pauli basis padded into the 6-level space, d set to the
        4-dimensional computational subspace."""
        data = cnot_data()
        identifiers = ['eps_12', 'eps_23', 'eps_34', 'b_12', 'b_23', 'b_34']
        H_c = list(zip(data['opers'], data['c_coeffs'], identifiers))
        H_n = list(zip(data['opers'], data['n_coeffs'], identifiers))
        qubit_basis = ff.Basis(
            [np.pad(b, 1, 'constant') for b in ff.Basis.pauli(2)[1:]],
            btype='Pauli')
        pulse = ff.PulseSequence(H_c, H_n, data['dt'], basis=qubit_basis)
        pulse.d = 4  # computational subspace dimension
        omega = np.geomspace(1 / pulse.tau, 1e2, 250)
        for amp, alpha, golden in zip(data['amp'], data['alpha'],
                                      data['infid_fast']):
            spectrum = amp / omega**alpha
            infid = np.asarray(ff.infidelity(pulse, spectrum, omega,
                                             identifiers[:3]))
            assert abs(1 - infid.sum() / golden) <= 0.10

    @pytest.mark.parametrize('gate', ['X2ID', 'Y2ID'])
    def test_x2id_y2id_process_golden(self, gate):
        """Error transfer matrix of the optimized sqrt(X)/sqrt(Y)
        goldens vs their MATLAB Monte-Carlo infidelities — the
        calculating_quantum_processes.ipynb pipeline (reference
        doc/source/examples/calculating_quantum_processes.ipynb cells
        4-21): 6-level zero-spin subspace, qubit-subspace Pauli basis
        completed by Basis.from_partial, 1/f^0.7 exchange noise on the
        two active couplings, second-order cumulant, I = 1 -
        |tr U_tilde|/d^2."""
        from testutil import gate_data
        data = gate_data(gate)
        identifiers = ['J_12', 'J_23', 'J_34', 'b_12', 'b_23', 'b_34']
        H_c = list(zip(data['opers'], data['c_coeffs'], identifiers))
        H_n = list(zip(data['opers'], data['n_coeffs'], identifiers))
        sub = ff.Basis.pauli(2)
        basis = ff.Basis.from_partial(
            [np.pad(b, 1, 'constant') for b in sub], labels=list(sub.labels))
        pulse = ff.PulseSequence(H_c, H_n, data['dt'], basis=basis)
        omega = np.geomspace(1 / pulse.tau, 1e2, 300)
        # the intermediate exchange is off during the single-qubit
        # gates: noise only on the two active couplings
        amp, golden = data['amp'][1], data['infid_fast'][1]
        spectrum = amp / omega**data['alpha'][1]
        etm = np.asarray(ff.error_transfer_matrix(
            pulse, spectrum, omega, ['J_12', 'J_34'], second_order=True))
        infid = 1 - abs(np.trace(etm[:16, :16])) / 16
        assert abs(1 - infid / golden) <= 0.15


@pytest.mark.skipif(not HAVE_REFERENCE, reason='reference unavailable')
class TestCorrelationCumulant:
    def test_cumulant_correlations_parity(self):
        """which='correlations' cumulant function vs reference (pulse-
        correlation decay amplitudes through the trace contraction)."""
        import filter_functions as ref
        from testutil import make_pulse, rand_pulse_arrays
        omega = np.linspace(0.5, 5, 21)
        base = rand_pulse_arrays(2, 2)
        arrays = []
        for _ in range(2):
            arr = rand_pulse_arrays(2, 2)
            arrays.append((arr[0], arr[1], arr[2], base[3], base[4],
                           base[5], arr[6]))
        ours = [make_pulse(a) for a in arrays]
        theirs = [make_pulse(a, cls=ref) for a in arrays]
        for o, t in zip(ours, theirs):
            o.cache_filter_function(omega)
            t.cache_filter_function(omega)
        got_pulse = ff.concatenate(ours, calc_pulse_correlation_FF=True,
                                   which='generalized')
        want_pulse = ref.concatenate(theirs, calc_pulse_correlation_FF=True,
                                     which='generalized')
        spectrum = 1e-2 / (1 + omega**2)
        got = np.asarray(numeric.calculate_cumulant_function(
            got_pulse, spectrum, omega, which='correlations'))
        want = ref.numeric.calculate_cumulant_function(
            want_pulse, spectrum, omega, which='correlations')
        assert_allclose(got, want, atol=1e-12)

    def test_extend_with_additional_noise_parity(self):
        import filter_functions as ref
        omega = np.linspace(0.5, 5, 9)
        x, z = sigma[1], sigma[3]

        def build(mod):
            p = mod.PulseSequence([[x, [np.pi / 2], 'X']],
                                  [[x, [1.0], 'X'], [z, [1.0], 'Z']],
                                  [1], basis=mod.Basis.pauli(1))
            p.cache_filter_function(omega)
            zz = np.kron(z, z)
            H_extra = [[zz / 2, [1.0], 'ZZ']]
            return mod.extend([(p, 0), (p, 1)],
                              additional_noise_Hamiltonian=H_extra)

        got = build(ff)
        want = build(ref)
        assert list(got.n_oper_identifiers) == \
            list(want.n_oper_identifiers)
        assert_allclose(to_np(got.get_filter_function(omega)),
                        want.get_filter_function(omega), atol=1e-10)


class TestDoubleSingleK2Lattice:
    """The native-f32 double-single K2 lattice
    (numeric._second_order_integral_single_f32, FF_TPU_SO_LATTICE=ds)
    must match the emulated-f64 lattice at the f32 output target on
    regular grids, and BEAT it at grazing near-resonances
    (|y dt| ~ 1e-10) where the f64 route's elementwise
    (f(x) - f(z))/y cancels catastrophically while the ds route's
    divided-difference Taylor branch is cancellation-free.  Oracle for
    the grazing rows: 50-digit mpmath evaluation of the closed form
    (reference /root/reference/filter_functions/numeric.py:170-256)."""

    def _grids(self):
        import jax.numpy as jnp
        local = np.random.default_rng(7)
        cases = []
        for trial in range(6):
            d = [2, 4, 8][trial % 3]
            scale = [1.0, 1e3][trial % 2]
            ev = np.sort(local.normal(scale=scale, size=d))
            dE = (ev[:, None] - ev[None, :]).ravel()
            dt = abs(local.normal(scale=1 / scale)) + 0.1 / scale
            omega = np.concatenate([
                np.geomspace(1e-3 * scale, 1e3 * scale, 40),
                [-dE[dE != 0][0]],          # exact y == 0 hit
                [0.0],                      # exact x == 0 column
            ])
            cases.append((jnp.asarray(omega), jnp.asarray(ev),
                          jnp.asarray(dt)))
        return cases

    def test_matches_f64_lattice_on_regular_grids(self):
        for omega, ev, dt in self._grids():
            want = to_np(numeric._second_order_integral_single(
                omega, ev, dt))
            got = to_np(numeric._second_order_integral_single_f32(
                omega, ev, dt)).astype(complex)
            scale = np.abs(want).max()
            # f32 output target: ~2^-23 elementwise + Taylor-branch
            # truncation (1e-2)^3/5! << that
            assert_allclose(got, want, atol=5e-7 * scale)

    def test_beats_f64_lattice_at_grazing_resonance(self):
        mpmath = pytest.importorskip('mpmath')
        import jax.numpy as jnp
        mp = mpmath.mp
        old_dps, mp.dps = mp.dps, 50
        try:
            local = np.random.default_rng(3)
            d = 4
            ev = np.sort(local.normal(size=d))
            dE = (ev[:, None] - ev[None, :]).ravel()
            dt = 0.7
            nz = dE[dE != 0]
            omega = -nz + local.normal(scale=1e-10 / dt, size=nz.size)
            f64_lat = to_np(numeric._second_order_integral_single(
                jnp.asarray(omega), jnp.asarray(ev), jnp.asarray(dt)))
            ds_lat = to_np(numeric._second_order_integral_single_f32(
                jnp.asarray(omega), jnp.asarray(ev),
                jnp.asarray(dt))).astype(complex)

            def frac(u):
                if u == 0:
                    return mpmath.mpc(0, dt)
                return mpmath.expm1(mpmath.mpc(0, 1) * u * dt) / u

            scale = np.abs(f64_lat).max()
            worst_f64, worst_ds = 0.0, 0.0
            # adjudicate the largest-disagreement entries
            diff = np.abs(ds_lat - f64_lat)
            for flat in np.argsort(diff.ravel())[::-1][:8]:
                o, i, j, m, n = np.unravel_index(flat, f64_lat.shape)
                x = mpmath.mpf(dE[i * d + j]) - mpmath.mpf(omega[o])
                y = mpmath.mpf(omega[o]) + mpmath.mpf(dE[m * d + n])
                z = (mpmath.mpf(dE[i * d + j])
                     + mpmath.mpf(dE[m * d + n]))
                assert y != 0
                want = complex((frac(x) - frac(z)) / y)
                worst_f64 = max(worst_f64,
                                abs(f64_lat[o, i, j, m, n] - want) / scale)
                worst_ds = max(worst_ds,
                               abs(ds_lat[o, i, j, m, n] - want) / scale)
            # f64 lattice cancels (measured ~2.7e-4); ds stays at its
            # f32 target (measured ~4.5e-8) -- require a 100x win and
            # absolute correctness of the ds route
            assert worst_ds < 5e-7, worst_ds
            assert worst_f64 > 100 * worst_ds, (worst_f64, worst_ds)
        finally:
            mp.dps = old_dps

    def test_shifts_route_ds_vs_f64(self, monkeypatch):
        """End-to-end: _second_order_diag_shifts at f32 working
        precision gives the same answer (to the f32 target) whether
        the lattice is built ds or emulated-f64."""
        import jax.numpy as jnp
        from filter_functions_tpu.cplx import asc

        local = np.random.default_rng(11)
        d, G, n_w, n_nops = 3, 4, 31, 2
        ev = local.standard_normal((G, d))
        dt = 1 - local.random(G)
        de = ev[0][:, None] - ev[0][None, :]
        omega = np.concatenate([np.geomspace(1e-1, 1e1, n_w - 1),
                                [-de[0, 1]]])
        n_b = d * d
        n_t = asc(local.standard_normal((n_nops, G, d, d))
                  + 1j * local.standard_normal((n_nops, G, d, d)))
        b_t = asc(local.standard_normal((G, n_b, d, d))
                  + 1j * local.standard_normal((G, n_b, d, d)))
        step = asc(local.standard_normal((n_nops, G, n_b, len(omega)))
                   + 1j * local.standard_normal((n_nops, G, n_b,
                                                 len(omega))))
        step = step._map(lambda v: v.swapaxes(0, 1))
        cum = asc(local.standard_normal((G, n_nops, n_b, len(omega)))
                  + 1j * local.standard_normal((G, n_nops, n_b,
                                                len(omega))))
        w = local.random((n_nops, len(omega)))
        args = (jnp.asarray(ev), n_t, b_t, step, cum,
                jnp.asarray(omega), jnp.asarray(dt), jnp.asarray(w))

        monkeypatch.setenv('FF_TPU_SO_FACTORED', '0')
        monkeypatch.setenv('FF_TPU_SO_LATTICE', 'f64')
        want = numeric._second_order_diag_shifts(
            *args, dtype=jnp.float32).to_numpy()
        monkeypatch.setenv('FF_TPU_SO_LATTICE', 'ds')
        got = numeric._second_order_diag_shifts(
            *args, dtype=jnp.float32).to_numpy()
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, atol=2e-6 * scale)
