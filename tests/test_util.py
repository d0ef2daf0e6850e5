"""Utility-function tests (cf. reference tests/test_util.py): tensor
family against np.kron, matrix-product helpers, integration,
frequency grids, identifier utilities."""
import numpy as np
import pytest

import filter_functions_tpu as ff
from filter_functions_tpu import util
from filter_functions_tpu.cplx import C, asc
from conftest import HAVE_REFERENCE
from testutil import assert_allclose, rand_unit, rng


class TestTensor:
    def test_tensor_vs_kron(self):
        for _ in range(5):
            a = rng.standard_normal((3, 3)) + 1j * rng.standard_normal((3, 3))
            b = rng.standard_normal((2, 2))
            assert_allclose(util.tensor(a, b), np.kron(a, b), atol=1e-15)

    def test_tensor_chain(self):
        mats = [rng.standard_normal((2, 2)) for _ in range(4)]
        want = mats[0]
        for m in mats[1:]:
            want = np.kron(want, m)
        assert_allclose(util.tensor(*mats), want, atol=1e-14)

    def test_tensor_broadcasting(self):
        a = rng.standard_normal((5, 2, 2))
        b = rng.standard_normal((5, 3, 3))
        got = util.tensor(a, b)
        assert got.shape == (5, 6, 6)
        for i in range(5):
            assert_allclose(got[i], np.kron(a[i], b[i]), atol=1e-14)

    def test_tensor_rank1(self):
        a, b = np.arange(2), np.arange(2, 5)
        got = util.tensor(a, b, rank=1)
        assert_allclose(got, np.outer(a, b).ravel())

    def test_tensor_incompatible(self):
        a = rng.standard_normal((3, 1, 2))
        b = rng.standard_normal((2, 2, 2))
        with pytest.raises(ValueError):
            util.tensor(a, b, rank=2)

    def test_tensor_insert(self):
        I, X, Y, Z = util.paulis
        arr = util.tensor(X, I)
        r = util.tensor_insert(arr, Y, Z, pos=0, arr_dims=[[2, 2], [2, 2]])
        assert_allclose(r, util.tensor(Y, Z, X, I), atol=1e-15)
        r = util.tensor_insert(arr, Y, Z, pos=1, arr_dims=[[2, 2], [2, 2]])
        assert_allclose(r, util.tensor(X, Y, Z, I), atol=1e-15)
        r = util.tensor_insert(arr, Y, Z, pos=2, arr_dims=[[2, 2], [2, 2]])
        assert_allclose(r, util.tensor(X, I, Y, Z), atol=1e-15)

    def test_tensor_insert_multi_pos(self):
        arrs, args = rng.standard_normal((2, 2, 2)), \
            rng.standard_normal((2, 2, 2))
        r = util.tensor_insert(util.tensor(*arrs), *args, pos=(0, 1),
                               arr_dims=[[2, 2], [2, 2]])
        assert_allclose(r, util.tensor(args[0], arrs[0], args[1], arrs[1]),
                        atol=1e-14)

    def test_tensor_insert_errors(self):
        I, X, Y, Z = util.paulis
        with pytest.raises(ValueError):
            util.tensor_insert(util.tensor(X, I), pos=0,
                               arr_dims=[[2, 2], [2, 2]])
        with pytest.raises(IndexError):
            util.tensor_insert(util.tensor(X, I), Y, pos=5,
                               arr_dims=[[2, 2], [2, 2]])

    def test_tensor_merge(self):
        I, X, Y, Z = util.paulis
        r = util.tensor_merge(util.tensor(X, Y, Z), util.tensor(I, I),
                              pos=[1, 2], arr_dims=[[2] * 3, [2] * 3],
                              ins_dims=[[2] * 2, [2] * 2])
        assert_allclose(r, util.tensor(X, I, Y, I, Z), atol=1e-15)

    def test_tensor_transpose(self):
        I, X, Y, Z = util.paulis
        r = util.tensor_transpose(util.tensor(X, Y, Z), [1, 2, 0],
                                  [[2, 2, 2]] * 2)
        assert_allclose(r, util.tensor(Y, Z, X), atol=1e-15)
        with pytest.raises(ValueError):
            util.tensor_transpose(util.tensor(X, Y), [0, 0], [[2, 2]] * 2)

    def test_tensor_on_C(self):
        a = rng.standard_normal((2, 2)) + 1j * rng.standard_normal((2, 2))
        b = rng.standard_normal((3, 3)) + 1j * rng.standard_normal((3, 3))
        got = util.tensor(asc(a), asc(b))
        assert isinstance(got, C)
        assert_allclose(got.to_numpy(), np.kron(a, b), atol=1e-14)


class TestMatrixProducts:
    def test_mdot(self):
        mats = rand_unit(3, 4)
        want = mats[0] @ mats[1] @ mats[2] @ mats[3]
        assert_allclose(util.mdot(mats), want, atol=1e-14)
        got = util.mdot(asc(mats)).to_numpy()
        assert_allclose(got, want, atol=1e-13)

    def test_adot(self):
        mats = rand_unit(3, 5)
        want = np.empty_like(mats)
        want[0] = mats[0]
        for g in range(1, 5):
            want[g] = mats[g] @ want[g - 1]
        got = util.adot(asc(mats)).to_numpy()
        assert_allclose(got, want, atol=1e-13)
        assert_allclose(util.adot(mats), want, atol=1e-13)


class TestMisc:
    def test_integrate(self):
        x = np.linspace(0, np.pi, 1001)
        f = np.sin(x)
        assert_allclose(util.integrate(f, x), 2.0, rtol=1e-5)
        assert_allclose(util.integrate(np.stack([f, 2 * f]), x),
                        [2.0, 4.0], rtol=1e-5)

    def test_abs2(self):
        z = rng.standard_normal(10) + 1j * rng.standard_normal(10)
        assert_allclose(util.abs2(z), np.abs(z)**2, atol=1e-15)
        assert_allclose(util.abs2(asc(z)), np.abs(z)**2, atol=1e-15)

    def test_oper_equiv(self):
        psi = util.paulis[1]
        phi = util.paulis[1] * np.exp(1j * 1.2345)
        eq, phase = util.oper_equiv(psi, phi)
        assert eq
        assert_allclose(phase, 1.2345, rtol=1e-10)
        eq, _ = util.oper_equiv(util.paulis[1], util.paulis[2])
        assert not eq

    def test_dot_HS(self):
        u, v = util.paulis[1:3]
        assert util.dot_HS(u, v) == 0
        assert util.dot_HS(u, u) == 2

    def test_get_sample_frequencies(self):
        pulse = ff.PulseSequence([[util.paulis[1], [1.0], 'X']],
                                 [[util.paulis[3], [1.0], 'Z']], [2.0])
        w = util.get_sample_frequencies(pulse, n_samples=100)
        assert len(w) == 100
        assert_allclose(w[0], 2 * np.pi * 1e-2 / 2.0)
        assert_allclose(w[-1], 2 * np.pi * 10 / 2.0)
        w = util.get_sample_frequencies(pulse, n_samples=50,
                                        spacing='linear',
                                        include_quasistatic=True)
        assert len(w) == 50 and w[0] == 0
        with pytest.raises(ValueError):
            util.get_sample_frequencies(pulse, spacing='monkey')

    def test_identifier_indices(self):
        ids = ['B_0', 'B_1', 'B_2']
        assert_allclose(util.get_indices_from_identifiers(ids, None),
                        [0, 1, 2])
        assert_allclose(util.get_indices_from_identifiers(ids, 'B_1'), [1])
        assert_allclose(util.get_indices_from_identifiers(ids,
                                                          ['B_2', 'B_0']),
                        [2, 0])
        with pytest.raises(ValueError):
            util.get_indices_from_identifiers(ids, ['nope'])

    def test_hash_and_equality(self):
        a = rng.standard_normal((3, 2, 2))
        h = util.hash_array_along_axis(a)
        assert len(h) == 3
        assert util.all_array_equal([a, a.copy()])
        assert not util.all_array_equal([a, a + 1])
        # -0.0 sanitization
        b = a.copy()
        b[b == 0] = -0.0
        assert util.hash_array_along_axis(a) == util.hash_array_along_axis(b)

    @pytest.mark.skipif(not HAVE_REFERENCE, reason='reference unavailable')
    def test_tensor_matches_reference(self):
        from filter_functions import util as ref_util
        a = rng.standard_normal((5, 2, 2)) + 1j * rng.standard_normal(
            (5, 2, 2))
        b = rng.standard_normal((5, 3, 3))
        assert_allclose(util.tensor(a, b), ref_util.tensor(a, b),
                        atol=1e-15)
        arr = util.tensor(a, b)
        ins = rng.standard_normal((2, 2))
        assert_allclose(
            util.tensor_insert(arr, ins, pos=1, arr_dims=[[2, 3], [2, 3]]),
            ref_util.tensor_insert(arr, ins, pos=1,
                                   arr_dims=[[2, 3], [2, 3]]), atol=1e-14)
