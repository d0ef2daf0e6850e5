"""Basis tests: constructors, characteristics, expansions, FF
basis-independence (cf. reference tests/test_basis.py)."""
import numpy as np
import pytest

import filter_functions_tpu as ff
from filter_functions_tpu import cplx
from filter_functions_tpu.basis import (Basis, equivalent_pauli_basis_elements,
                                        expand, ggm_expand,
                                        remap_pauli_basis_elements)
from conftest import HAVE_REFERENCE
from testutil import (assert_allclose, rand_herm, rand_herm_traceless,
                      rand_pulse_arrays, make_pulse, rng, to_np)


class TestConstructors:
    @pytest.mark.parametrize('n', [1, 2, 3])
    def test_pauli(self, n):
        b = Basis.pauli(n)
        d = 2**n
        assert b.shape == (d * d, d, d)
        assert b.isherm and b.isorthonorm and b.istraceless and b.iscomplete
        assert b.btype == 'Pauli'
        # first element is the normalized identity
        assert_allclose(b[0], np.eye(d) / np.sqrt(d))

    @pytest.mark.parametrize('d', [2, 3, 5, 8])
    def test_ggm(self, d):
        b = Basis.ggm(d)
        assert b.shape == (d * d, d, d)
        assert b.isherm and b.isorthonorm and b.istraceless and b.iscomplete
        gram = np.einsum('iab,jba->ij', b.np.conj().swapaxes(-1, -2), b.np)
        assert_allclose(gram, np.eye(d * d), atol=1e-14)

    @pytest.mark.skipif(not HAVE_REFERENCE, reason='reference unavailable')
    @pytest.mark.parametrize('d', [2, 3, 4, 6])
    def test_ggm_matches_reference(self, d):
        import filter_functions as ref
        assert_allclose(Basis.ggm(d).np, np.asarray(ref.Basis.ggm(d)),
                        atol=1e-15)

    @pytest.mark.skipif(not HAVE_REFERENCE, reason='reference unavailable')
    @pytest.mark.parametrize('n', [1, 2])
    def test_pauli_matches_reference(self, n):
        import filter_functions as ref
        assert_allclose(Basis.pauli(n).np, np.asarray(ref.Basis.pauli(n)),
                        atol=1e-15)

    def test_from_partial(self):
        elems = Basis.pauli(1)[:2]
        b = Basis.from_partial(elems)
        assert b.iscomplete and b.isorthonorm
        assert np.allclose(b[0], elems[0]) and np.allclose(b[1], elems[1])

    def test_from_partial_traceless_error(self):
        elem = rand_herm(3)[0]
        elem += np.eye(3)  # definitely not traceless
        with pytest.raises(ValueError):
            Basis.from_partial([elem], traceless=True)

    def test_overcomplete_error(self):
        with pytest.raises(ValueError):
            Basis(rand_herm(2, 5))

    def test_characteristics_custom(self):
        b = Basis(rand_herm(3, 4))
        assert b.isherm
        assert not b.iscomplete
        nonherm = Basis(rng.standard_normal((2, 3, 3))
                        + 1j * rng.standard_normal((2, 3, 3)))
        assert not nonherm.isherm

    def test_constructor_failure_modes(self):
        """Failure modes pinned by reference tests/test_basis.py:42-99."""
        with pytest.raises(TypeError):
            Basis(1)
        with pytest.raises(TypeError):
            Basis([np.eye(2), object()])
        # too many elements
        with pytest.raises(ValueError):
            Basis(rng.standard_normal((5, 2, 2)))
        # non-traceless elems but traceless basis requested
        with pytest.raises(ValueError):
            Basis(np.ones((2, 2)), traceless=True)
        with pytest.raises(ValueError):
            Basis.from_partial(np.ones((1, 2, 2)) / np.sqrt(2),
                               traceless=True)
        # wrong number of labels
        from filter_functions_tpu import util
        with pytest.raises(ValueError):
            Basis(util.paulis, labels=['a', 'b', 'c'])
        with pytest.raises(ValueError):
            Basis.from_partial(Basis.pauli(1)[:2], labels=['a', 'b', 'c'])

    def test_constructor_2d_element(self):
        # single 2d element becomes a 3d (1, d, d) basis
        b = Basis(rng.standard_normal((2, 2)))
        assert b.shape == (1, 2, 2)
        # the identity alone is traceless-up-to-identity
        assert Basis(np.eye(2), traceless=False) == \
            Basis(np.eye(2), traceless=True)

    def test_constructor_from_basis(self):
        inner = Basis.ggm(2)
        b = Basis(inner)
        assert b == inner and b.btype == 'GGM'
        # slicing a Basis yields plain arrays usable for construction
        b2 = Basis(Basis.ggm(2)[1:])
        assert b2.shape == (3, 2, 2)
        # construction must not change the elements
        elems = rng.standard_normal((6, 3, 3))
        assert_allclose(np.asarray(Basis(elems)), elems, atol=0)

    def test_from_partial_labels(self):
        from filter_functions_tpu import util
        # identity label moves to the front
        b = Basis.from_partial([util.paulis[1] / np.sqrt(2),
                                util.paulis[0] / np.sqrt(2)],
                               labels=['x', 'i'])
        assert b.labels[:2] == ['i', 'x']
        assert b.labels[2:] == ['$C_{2}$', '$C_{3}$']
        # labels copied from a Basis input when counts match
        partial = Basis(Basis.pauli(1)[[1, 3]], labels=['X', 'Z'],
                        btype='Pauli')
        b = Basis.from_partial(partial)
        assert b.labels[:2] == ['X', 'Z']
        assert b.labels[2:] == ['$C_{2}$', '$C_{3}$']

    def test_from_partial_2d_equals_3d(self):
        elems = rand_herm(3)
        b1 = Basis.from_partial(elems, labels=['weif'])
        b2 = Basis.from_partial(elems.squeeze(), labels=['weif'])
        assert b1 == b2

    def test_from_partial_nonorthogonal(self):
        from filter_functions_tpu import util
        with pytest.raises(ValueError, match='orthogonal'):
            Basis.from_partial([util.paulis[1],
                                util.paulis[1] + 0.5 * util.paulis[2]])

    def test_transpose_and_adjoint(self):
        arr = rng.standard_normal((2, 3, 3)) \
            + 1j * rng.standard_normal((2, 3, 3))
        b = Basis(arr)
        assert_allclose(np.asarray(b.T), arr.swapaxes(-1, -2), atol=0)
        assert_allclose(np.asarray(b.H), arr.conj().swapaxes(-1, -2),
                        atol=0)
        assert b.T.btype == b.btype

    def test_contains_and_eq(self):
        b = Basis.pauli(1)
        assert b[2] in b
        assert rng.standard_normal((2, 2)) not in b
        assert b == Basis.pauli(1)
        assert not (b == Basis.ggm(3))          # shape mismatch
        assert not (b == np.asarray(b) + 1)
        assert b != 'a string'

    def test_normalize_and_tidyup(self):
        arr = 3.0 * rand_herm_traceless(3, 2)
        b = Basis(arr)
        assert not b.isnorm
        nb = b.normalize(copy=True)
        assert nb.isnorm and not b.isnorm
        b.normalize()
        assert b.isnorm
        # tidyup zeroes sub-eps noise and invalidates caches
        eps = np.finfo(complex).eps
        noisy = Basis(np.eye(2) + 0.1 * eps)
        noisy.tidyup()
        assert_allclose(np.asarray(noisy), np.eye(2)[None], atol=0)

    def test_sparse_property(self):
        b = Basis.pauli(1)
        assert_allclose(b.sparse, np.asarray(b), atol=0)

    def test_four_element_traces_too_large(self):
        b = Basis.ggm(16)
        with pytest.raises(MemoryError):
            b.four_element_traces

    def test_single_element_orthogonal(self):
        d = 5
        single = Basis(rng.standard_normal((d, d)))
        assert single.isorthogonal
        single.normalize()
        assert single.isorthonorm

    def test_istraceless_variants(self):
        # traceless + identity counts as traceless
        assert Basis.pauli(1).istraceless
        # two traceful elements -> not traceless
        assert not Basis([np.eye(2), np.diag([2.0, 1.0])]).istraceless
        # one traceful non-identity element -> not traceless
        assert not Basis([np.diag([2.0, 1.0])]).istraceless
        t = rand_herm_traceless(4, 3)
        assert Basis(t).istraceless
        t[0, 0, 0] += 1
        assert not Basis(t).istraceless

    @pytest.mark.skipif(not HAVE_REFERENCE, reason='reference unavailable')
    def test_from_partial_matches_reference(self):
        import filter_functions as ref
        elems = rand_herm_traceless(3, 2)
        # orthogonalize the two elements against each other
        elems[1] -= (np.einsum('ij,ij', elems[0].conj(), elems[1])
                     / np.einsum('ij,ij', elems[0].conj(), elems[0])
                     ) * elems[0]
        ours = Basis.from_partial(elems.copy())
        theirs = ref.Basis.from_partial(elems.copy())
        # the completion is unique only up to rotations of the added
        # span; check the fixed part and the characteristics instead
        assert_allclose(np.asarray(ours)[:2],
                        np.asarray(theirs)[:2], atol=1e-12)
        assert ours.isorthonorm and ours.iscomplete and ours.istraceless


class TestExpansion:
    @pytest.mark.parametrize('d', [2, 3, 5])
    def test_expand_roundtrip(self, d):
        b = Basis.ggm(d)
        m = rand_herm(d, 4)
        coeffs = b.expand(m, hermitian=True)
        recon = np.einsum('nj,jab->nab', coeffs, b.np)
        assert_allclose(recon, m, atol=1e-13)

    @pytest.mark.parametrize('d', [2, 3, 5])
    def test_ggm_expand_equals_inner_products(self, d):
        b = Basis.ggm(d)
        m = rng.standard_normal((4, d, d)) \
            + 1j * rng.standard_normal((4, d, d))
        fast = ggm_expand(m)
        slow = expand(m, b)
        assert_allclose(fast, slow, atol=1e-13)

    def test_ggm_expand_device(self):
        d = 4
        m = rng.standard_normal((3, d, d)) \
            + 1j * rng.standard_normal((3, d, d))
        dev = ggm_expand(cplx.asc(m))
        host = ggm_expand(m)
        assert_allclose(dev.to_numpy(), host, atol=1e-13)

    def test_expand_device_matches_host(self):
        d = 3
        b = Basis.ggm(d)
        m = rand_herm(d, 2)
        dev = expand(cplx.asc(m), b, hermitian=True)
        host = expand(m, b, hermitian=True)
        assert_allclose(np.asarray(dev), host, atol=1e-13)

    def test_expand_dtypes_and_method_equivalence(self):
        """Expansion dtypes and the pauli/ggm method equivalence
        (reference tests/test_basis.py:205-236)."""
        b = Basis.ggm(3)
        r = expand(rng.standard_normal((3, 3)), b, hermitian=False)
        assert np.asarray(r).dtype == np.complex128
        r = expand(rand_herm(3), b, hermitian=True)
        assert np.asarray(r).dtype == np.float64
        r = ggm_expand(rand_herm(3), hermitian=True)
        assert np.asarray(r).dtype == np.float64
        r = ggm_expand(rng.standard_normal((3, 3)), hermitian=False)
        assert np.asarray(r).dtype == np.complex128

        pauli, ggm = Basis.pauli(1), Basis.ggm(2)
        m = rand_herm(2, 3)
        assert_allclose(pauli.expand(m, hermitian=True, tidyup=True),
                        ggm.expand(m, hermitian=True, tidyup=True),
                        atol=1e-14)
        from testutil import rand_unit
        m = rand_unit(2, 3)
        assert_allclose(pauli.expand(m, hermitian=False, tidyup=True),
                        ggm.expand(m, hermitian=False, tidyup=True),
                        atol=1e-14)

    @pytest.mark.parametrize('d', [2, 5, 9])
    def test_unnormalized_basis_expansion(self, d):
        """expand(normalized=False) reconstructs through an
        unnormalized basis (reference tests/test_basis.py:238-258)."""
        ggm_basis = Basis.ggm(d)
        scales = rng.standard_normal(d * d)
        scales[scales == 0] = 1.0
        basis = Basis(np.einsum('i,ijk->ijk', scales, np.asarray(ggm_basis)))
        m = rng.standard_normal((d, d)) + 1j * rng.standard_normal((d, d))
        m -= np.trace(m) / d * np.eye(d)
        coeffs = expand(m, basis, normalized=False)
        assert_allclose(np.einsum('i,ijk', coeffs, np.asarray(basis)), m,
                        atol=1e-12)
        assert_allclose(expand(m, ggm_basis), ggm_expand(m), atol=1e-14)
        assert_allclose(ggm_expand(m), ggm_expand(m, traceless=True),
                        atol=1e-14)
        # batched
        mb = rng.standard_normal((7, d, d)) + 1j * rng.standard_normal(
            (7, d, d))
        coeffs = expand(mb, basis, normalized=False)
        assert_allclose(np.einsum('li,ijk->ljk', coeffs,
                                  np.asarray(basis)), mb, atol=1e-12)
        with pytest.raises(ValueError):
            ggm_expand(np.asarray(basis)[..., 0])
        # normalize: function vs method, copy semantics
        from filter_functions_tpu.basis import normalize
        assert normalize(basis).isorthonorm
        normalized = normalize(basis)
        basis.normalize()
        assert normalized == basis

    def test_ff_invariant_under_basis_choice(self):
        """Fidelity filter function must not depend on the basis."""
        arrays = rand_pulse_arrays(4, 3)
        omega = np.linspace(0.5, 10, 11)
        f_ggm = to_np(make_pulse(arrays, 'GGM').get_filter_function(omega))
        f_pauli = to_np(
            make_pulse(arrays, 'Pauli').get_filter_function(omega))
        assert_allclose(f_ggm, f_pauli, atol=1e-12)


class TestTraceTensor:
    @pytest.mark.parametrize('d', [2, 3])
    def test_four_element_traces(self, d):
        b = Basis.ggm(d)
        t = b.four_element_traces
        want = np.einsum('iab,jbc,kcd,lda->ijkl', b.np, b.np, b.np, b.np)
        assert_allclose(t, want, atol=1e-14)

    def test_pauli_mult_table(self):
        for n in (1, 2):
            b = Basis.pauli(n)
            idx, phase = b.pauli_mult_table()
            d = 2**n
            prod = np.einsum('iab,jbc->ijac', b.np, b.np)
            want = phase[..., None, None] / np.sqrt(d) * b.np[idx]
            assert_allclose(prod, want, atol=1e-14)


class TestPauliIndexMachinery:
    def test_equivalent_elements(self):
        # single qubit 0 of 2: elements I?, X?, Y?, Z? with ? = I
        got = equivalent_pauli_basis_elements([0], 2)
        assert list(got) == [0, 4, 8, 12]
        got = equivalent_pauli_basis_elements([1], 2)
        assert list(got) == [0, 1, 2, 3]

    def test_remap_elements(self):
        n = 2
        b = Basis.pauli(n)
        perm = remap_pauli_basis_elements([1, 0], n)
        # remapped basis element perm[i] == tensor-transposed element i
        from filter_functions_tpu import util
        transposed = util.tensor_transpose(b.np, [1, 0], [[2, 2], [2, 2]])
        assert_allclose(b.np[perm], transposed, atol=1e-15)

    @pytest.mark.skipif(not HAVE_REFERENCE, reason='reference unavailable')
    def test_index_machinery_matches_reference(self):
        from filter_functions.basis import (
            equivalent_pauli_basis_elements as ref_eq,
            remap_pauli_basis_elements as ref_remap)
        for n in (2, 3):
            for idx in ([0], [1], [0, 2] if n == 3 else [0, 1]):
                assert_allclose(equivalent_pauli_basis_elements(idx, n),
                                ref_eq(idx, n))
            for order in ([1, 0] if n == 2 else [2, 0, 1],):
                assert_allclose(remap_pauli_basis_elements(order, n),
                                ref_remap(order, n))
