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
