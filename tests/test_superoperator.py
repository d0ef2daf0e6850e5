"""Superoperator tests: Liouville representation, Choi conversion,
CP/cCP checks (cf. reference tests/test_superoperator.py)."""
import numpy as np
import pytest

import filter_functions_tpu as ff
from filter_functions_tpu import superoperator
from filter_functions_tpu.basis import Basis
from filter_functions_tpu.cplx import asc
from conftest import HAVE_REFERENCE
from testutil import assert_allclose, rand_unit, rng, to_np


class TestLiouville:
    @pytest.mark.parametrize('d', [2, 3, 4])
    def test_unitary_is_orthogonal(self, d):
        """Liouville rep of a unitary in a hermitian basis is real
        orthogonal."""
        u = rand_unit(d)[0]
        basis = Basis.ggm(d)
        r = np.asarray(superoperator.liouville_representation(asc(u), basis))
        assert r.dtype.kind == 'f'
        assert_allclose(r @ r.T, np.eye(d * d), atol=1e-12)

    def test_identity(self):
        basis = Basis.pauli(1)
        r = np.asarray(superoperator.liouville_representation(
            asc(np.eye(2)), basis))
        assert_allclose(r, np.eye(4), atol=1e-14)

    def test_composition(self):
        d = 3
        basis = Basis.ggm(d)
        u, v = rand_unit(d, 2)
        ru = np.asarray(superoperator.liouville_representation(asc(u),
                                                               basis))
        rv = np.asarray(superoperator.liouville_representation(asc(v),
                                                               basis))
        ruv = np.asarray(superoperator.liouville_representation(
            asc(u @ v), basis))
        assert_allclose(ruv, ru @ rv, atol=1e-12)

    @pytest.mark.skipif(not HAVE_REFERENCE, reason='reference unavailable')
    def test_matches_reference(self):
        import filter_functions as ref
        d = 3
        u = rand_unit(d, 4)
        got = np.asarray(superoperator.liouville_representation(
            asc(u), Basis.ggm(d)))
        want = ref.superoperator.liouville_representation(
            u, ref.Basis.ggm(d))
        assert_allclose(got, want, atol=1e-12)


class TestChoiCP:
    def test_unitary_is_cp(self):
        d = 2
        basis = Basis.pauli(1)
        u = rand_unit(d)[0]
        r = superoperator.liouville_representation(asc(u), basis)
        assert superoperator.liouville_is_CP(r, basis)
        assert superoperator.liouville_is_cCP(r, basis)

    def test_depolarizing_is_cp(self):
        """Depolarizing channel: rho -> (1-p) rho + p I/d."""
        basis = Basis.pauli(1)
        p = 0.3
        r = np.diag([1.0, 1 - p, 1 - p, 1 - p])
        cp, (dvals, _) = superoperator.liouville_is_CP(r, basis,
                                                       return_eig=True)
        assert cp
        assert np.asarray(dvals).min() >= -1e-14

    def test_noncp_detected(self):
        """Transpose map is positive but not CP."""
        basis = Basis.pauli(1)
        # Liouville rep of transposition in the Pauli basis: Y -> -Y
        r = np.diag([1.0, 1.0, -1.0, 1.0])
        assert not superoperator.liouville_is_CP(r, basis)

    @pytest.mark.parametrize('d', [2, 3, 4])
    def test_unitary_channel_choi_rank_one(self, d):
        """A unitary channel's Choi matrix has exactly one nonzero
        eigenvalue (cf. reference test_superoperator.py:116-136);
        batched input yields per-element verdicts."""
        n = np.log2(d)
        basis = Basis.pauli(int(n)) if n % 1 == 0 else Basis.ggm(d)
        u = rand_unit(d, 5)
        r = superoperator.liouville_representation(asc(u), basis)
        cp, (dvals, _) = superoperator.liouville_is_CP(r, basis,
                                                       return_eig=True)
        assert cp.shape == (5,) and np.all(cp)
        assert_allclose(np.asarray(dvals)[..., :-1], 0, atol=basis._atol)
        assert_allclose(np.asarray(dvals)[..., -1], d, rtol=1e-10)

    def test_partial_transpose_not_cp(self):
        """The two-qubit partial transpose map is positive but not CP
        (reference test_superoperator.py:104-113)."""
        from filter_functions_tpu.basis import expand
        basis = Basis.pauli(2)
        b = np.asarray(basis)
        pt = b.reshape(-1, 2, 2, 2, 2).swapaxes(-1, -3).reshape(b.shape)
        phi = expand(pt, basis).T
        assert not superoperator.liouville_is_CP(phi.real, basis)

    @pytest.mark.parametrize('d', [2, 3])
    def test_hermitian_generator_is_ccp(self, d):
        """-i[H, .] superoperators are cCP with all projected
        eigenvalues zero (reference test_superoperator.py:148-172)."""
        from testutil import rand_herm
        n = np.log2(d)
        basis = Basis.pauli(int(n)) if n % 1 == 0 else Basis.ggm(d)
        b = np.asarray(basis)
        h = 1j * rand_herm(d, 3)
        h_sup = (np.einsum('iab,nbc,jca->nij', b, h, b, optimize=True)
                 - np.einsum('iab,jbc,nca->nij', b, b, h, optimize=True))
        ccp, (dvals, _) = superoperator.liouville_is_cCP(h_sup, basis,
                                                         return_eig=True)
        assert ccp.shape == (3,) and np.all(ccp)
        assert_allclose(np.asarray(dvals), 0, atol=1e-13)

    def test_error_transfer_matrix_is_cp_and_cumulant_ccp(self):
        """Physical error channels are CP; cumulant functions cCP
        (reference test_superoperator.py:138-146, 174-187)."""
        from testutil import rand_pulse_sequence
        from filter_functions_tpu import numeric, util
        for d in (2, 3):
            pulse = rand_pulse_sequence(d, 1)
            omega = util.get_sample_frequencies(pulse)
            S = 1 / np.abs(omega)**2
            U = np.asarray(ff.error_transfer_matrix(pulse, S, omega))
            assert superoperator.liouville_is_CP(U, pulse.basis)
            K = np.asarray(numeric.calculate_cumulant_function(
                pulse, S, omega))
            ccp = superoperator.liouville_is_cCP(K, pulse.basis,
                                                 atol=1e-13)
            assert np.all(ccp)

    @pytest.mark.skipif(not HAVE_REFERENCE, reason='reference unavailable')
    def test_choi_matches_reference(self):
        import filter_functions as ref
        d = 2
        u = rand_unit(d)[0]
        basis = Basis.pauli(1)
        r = np.asarray(superoperator.liouville_representation(asc(u),
                                                              basis))
        got = to_np(superoperator.liouville_to_choi(r, basis))
        want = ref.superoperator.liouville_to_choi(r, ref.Basis.pauli(1))
        assert_allclose(got, want, atol=1e-12)
