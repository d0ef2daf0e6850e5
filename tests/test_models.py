"""Tests of the predefined pulse families (models package)."""
import numpy as np
import pytest

import filter_functions_tpu as ff
from filter_functions_tpu import analytic, util
from filter_functions_tpu.models import dd, qft, rb
from conftest import HAVE_REFERENCE
from testutil import assert_allclose, rng, to_np


class TestDD:
    @pytest.mark.parametrize('dd_type,n,oracle', [
        ('cpmg', 4, lambda z: analytic.CPMG(z, 4)),
        ('cpmg', 5, lambda z: analytic.CPMG(z, 5)),
        ('udd', 4, lambda z: analytic.UDD(z, 4)),
        ('pdd', 5, lambda z: analytic.PDD(z, 5)),
        ('cdd', 3, lambda z: analytic.CDD(z, 3)),
    ])
    def test_against_analytic(self, dd_type, n, oracle):
        tau = np.pi
        pulse = dd.dd_pulse(n, tau=tau, tau_pi=1e-9, dd_type=dd_type)
        omega = np.logspace(0, 2, 100)
        got = to_np(pulse.get_filter_function(omega))[0, 0].real
        assert_allclose(got, oracle(omega * tau) / omega**2, rtol=0,
                        atol=1e-10)

    def test_spin_echo(self):
        pulse = dd.spin_echo_pulse(tau=np.pi, tau_pi=1e-9)
        omega = np.logspace(0, 2, 50)
        got = to_np(pulse.get_filter_function(omega))[0, 0].real
        assert_allclose(got, analytic.SE(omega * np.pi) / omega**2,
                        rtol=0, atol=1e-10)

    def test_fid(self):
        pulse = dd.fid_pulse(tau=2.0)
        omega = np.linspace(0.1, 20, 100)
        got = to_np(pulse.get_filter_function(omega))[0, 0].real
        assert_allclose(got, analytic.FID(omega * 2.0) / omega**2,
                        rtol=0, atol=1e-12)


class TestQFT:
    @pytest.mark.parametrize('n_qubits', [2, 3])
    def test_propagator(self, n_qubits):
        pulse = qft.qft_pulse(n_qubits)
        prop = qft.swap_all(n_qubits) @ to_np(pulse.total_propagator)
        eq, _ = util.oper_equiv(prop, qft.qft_propagator(n_qubits),
                                eps=1e-10)
        assert eq

    def test_structure(self):
        pulse = qft.qft_pulse(3)
        assert pulse.d == 8
        assert len(pulse) == 3 * 3 + 1
        # noise opers normalized
        norms = np.linalg.norm(pulse.n_opers, axis=(1, 2))
        assert_allclose(norms, 1.0, atol=1e-12)


class TestRB:
    def test_group_closure(self):
        group = rb.clifford_group()
        assert len(group) == 24
        # closed under multiplication
        for _ in range(20):
            i, j = rng.integers(0, 24, 2)
            prod = group[i][0] @ group[j][0]
            assert rb._find(list(group), prod) >= 0

    def test_pulses_implement_group(self):
        pulses = rb.clifford_pulses()
        for (u, word), pulse in zip(rb.clifford_group(), pulses):
            eq, _ = util.oper_equiv(to_np(pulse.total_propagator), u,
                                    eps=1e-9)
            assert eq, word

    def test_sequence_identity(self):
        local = np.random.default_rng(7)
        pulses = rb.clifford_pulses()
        for length in (1, 3, 8):
            idx, rec = rb.sample_sequence(length, local)
            seq = rb.rb_pulse(idx, rec, pulses)
            eq, _ = util.oper_equiv(to_np(seq.total_propagator),
                                    np.eye(2), eps=1e-8)
            assert eq

    def test_cached_concatenation_matches_scratch(self):
        omega = np.linspace(0.5, 20, 40)
        pulses = rb.clifford_pulses(omega=omega)
        local = np.random.default_rng(3)
        idx, rec = rb.sample_sequence(4, local)
        seq = rb.rb_pulse(idx, rec, pulses)
        assert seq.is_cached('filter function')
        cached = to_np(seq.get_filter_function(omega))
        fresh = ff.PulseSequence.from_arrays(
            seq.c_opers, seq.c_oper_identifiers, seq.c_coeffs,
            seq.n_opers, seq.n_oper_identifiers, seq.n_coeffs, seq.dt,
            seq.basis)
        scratch = to_np(fresh.get_filter_function(omega))
        assert_allclose(cached, scratch, atol=1e-11)


@pytest.mark.skipif(not HAVE_REFERENCE, reason='needs golden data')
class TestExchange:
    def test_cnot_pulse_golden_infidelity(self):
        """models.exchange reproduces the MATLAB golden infidelities."""
        from filter_functions_tpu.models import exchange
        from testutil import cnot_data
        pulse = exchange.cnot_pulse()
        pulse.basis = exchange.qubit_subspace_basis()
        pulse.d = 4
        data = cnot_data()
        omega = np.geomspace(1 / pulse.tau, 1e2, 250)
        for amp, alpha, golden in zip(data['amp'], data['alpha'],
                                      data['infid_fast']):
            spectrum = amp / omega**alpha
            infid = np.asarray(ff.infidelity(
                pulse, spectrum, omega, ['eps_12', 'eps_23', 'eps_34']))
            assert abs(1 - infid.sum() / golden) <= 0.10

    def test_heisenberg_operators(self):
        from filter_functions_tpu.models import exchange
        ex, grad = exchange.heisenberg_operators(3)
        assert ex.shape == (2, 8, 8) and grad.shape == (2, 8, 8)
        # all terms commute with total S_z
        Z = np.diag([1., -1.])
        sz = np.zeros((8, 8))
        for j in range(3):
            acc = np.ones((1, 1))
            for k in range(3):
                acc = np.kron(acc, Z if k == j else np.eye(2))
            sz += acc
        for op in (*ex, *grad):
            assert np.allclose(op @ sz - sz @ op, 0, atol=1e-12)

    def test_dial_spectrum(self):
        from filter_functions_tpu.models import exchange
        w = np.geomspace(0.1, 10, 5)
        s = exchange.dial_spectrum(w, alpha=0.7)
        assert np.all(np.diff(s) < 0)
        assert np.allclose(exchange.dial_spectrum(w, alpha=0.0),
                           exchange.dial_spectrum(1.0, alpha=0.0))
