"""Utility-function tests (cf. reference tests/test_util.py): tensor
family against np.kron, matrix-product helpers, integration,
frequency grids, identifier utilities."""
import numpy as np
import pytest

import filter_functions_tpu as ff
from filter_functions_tpu import util
from filter_functions_tpu.cplx import C, asc, cexp, cexpm1
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

    def test_tensor_insert_reference_behaviors(self):
        """Negative/multi positions, rank 1/3 broadcasting, error
        messages (cf. reference tests/test_util.py:147-263)."""
        local = np.random.default_rng(3)
        I, X, Y, Z = util.paulis
        arr = util.tensor(X, I)
        r = util.tensor_insert(arr, Y, Z, arr_dims=[[2, 2], [2, 2]],
                               pos=-1)
        assert_allclose(r, util.tensor(X, Y, Z, I), atol=1e-15)
        with pytest.raises(IndexError, match='between -2 and 2'):
            util.tensor_insert(arr, Y, Z, arr_dims=[[2, 2], [2, 2]],
                               pos=3)
        # rank 1 with broadcasting
        A = local.standard_normal((2, 3, 1, 2))
        B = local.standard_normal((2, 3, 1, 2))
        C_ = local.standard_normal((3, 1, 3))
        ar = util.tensor(A, C_, rank=1)
        r = util.tensor_insert(ar, B, pos=1, rank=1, arr_dims=[[2, 3]])
        assert_allclose(r, util.tensor(A, B, C_, rank=1), atol=1e-13)
        with pytest.raises(ValueError, match='length rank'):
            util.tensor_insert(ar, B, pos=1, rank=1,
                               arr_dims=[[3, 3], [1, 2], [2, 1]])
        # rank 3
        A = local.standard_normal((2, 3, 1, 2))
        B = local.standard_normal((2, 3, 2, 2))
        C_ = local.standard_normal((3, 2, 1))
        ar = util.tensor(A, C_, rank=3)
        r = util.tensor_insert(ar, B, pos=1, rank=3,
                               arr_dims=[[3, 3], [1, 2], [2, 1]])
        assert_allclose(r, util.tensor(A, B, C_, rank=3), atol=1e-13)
        # multiple positions including duplicates
        arrs = local.standard_normal((2, 2, 2))
        args = local.standard_normal((2, 2, 2))
        dims = [[2, 2], [2, 2]]
        r = util.tensor_insert(util.tensor(*arrs), *args, pos=(0, 0),
                               arr_dims=dims)
        assert_allclose(r, util.tensor(*args, *arrs), atol=1e-13)
        r = util.tensor_insert(util.tensor(*arrs), *args, pos=(1, 2),
                               arr_dims=dims)
        assert_allclose(r, util.tensor(*np.insert(arrs, (1, 2), args,
                                                  axis=0)), atol=1e-13)
        with pytest.raises(ValueError):
            util.tensor_insert(util.tensor(*arrs), *args, pos=(0, 1, 2),
                               arr_dims=dims)
        # randomized round trips across ranks / broadcast shapes
        for rank, n_args, n_b in zip(local.integers(1, 4, 6),
                                     local.integers(3, 6, 6),
                                     local.integers(1, 8, 6)):
            stack = local.standard_normal((n_args, n_b, *[2] * rank))
            split = int(local.integers(1, n_args - 1))
            ins_idx = int(local.integers(split - n_args, n_args - split))
            base = util.tensor(*stack[split:], rank=rank)
            want = util.tensor(*np.insert(stack[split:], ins_idx,
                                          stack[:split], axis=0),
                               rank=rank)
            got = util.tensor_insert(base, *stack[:split], pos=ins_idx,
                                     rank=rank,
                                     arr_dims=[[2] * (n_args - split)]
                                     * rank)
            assert_allclose(got, want, atol=1e-10)

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

    def test_tensor_merge_reference_behaviors(self):
        """Merge==insert equivalence, negative positions, rank-1
        broadcasting, error paths, randomized round trips
        (cf. reference tests/test_util.py:263-371)."""
        local = np.random.default_rng(9)
        I, X, Y, Z = util.paulis
        arr = util.tensor(X, Y, Z)
        ins = util.tensor(I, I)
        r1 = util.tensor_merge(arr, ins, pos=[1, 2],
                               arr_dims=[[2] * 3] * 2,
                               ins_dims=[[2] * 2] * 2)
        r2 = util.tensor_merge(ins, arr, pos=[0, 1, 2],
                               arr_dims=[[2] * 2] * 2,
                               ins_dims=[[2] * 3] * 2)
        assert_allclose(r1, util.tensor(X, I, Y, I, Z), atol=1e-15)
        assert_allclose(r1, r2, atol=1e-15)

        arr = util.tensor(Y, Z)
        ins = util.tensor(I, X)
        r1 = util.tensor_merge(arr, ins, pos=[0, 0],
                               arr_dims=[[2] * 2] * 2,
                               ins_dims=[[2] * 2] * 2)
        r2 = util.tensor_insert(arr, I, X, pos=[0, 0],
                                arr_dims=[[2] * 2] * 2)
        assert_allclose(r1, r2, atol=1e-15)
        r = util.tensor_merge(arr, ins, arr_dims=[[2, 2]] * 2,
                              ins_dims=[[2, 2]] * 2, pos=(-1, -2))
        assert_allclose(r, util.tensor(X, Y, I, Z), atol=1e-15)

        with pytest.raises(ValueError):
            util.tensor_merge(arr, ins, pos=(1, 2),
                              arr_dims=[[2, 2]] * 3,
                              ins_dims=[[2, 2]] * 2)
        with pytest.raises(IndexError):
            util.tensor_merge(arr, ins, pos=(1, 3),
                              arr_dims=[[2, 2]] * 2,
                              ins_dims=[[2, 2]] * 2)
        with pytest.raises(ValueError):
            util.tensor_merge(arr, ins, pos=(1, 2),
                              arr_dims=[[2, 3], [2, 2]],
                              ins_dims=[[2, 2]] * 2)

        a = local.standard_normal((2, 10, 3, 4))
        b = local.standard_normal((2, 10, 3, 2))
        r = util.tensor_merge(util.tensor(*a, rank=1),
                              util.tensor(*b, rank=1), pos=[0, 1],
                              arr_dims=[[4, 4]], ins_dims=[[2, 2]],
                              rank=1)
        assert_allclose(r, util.tensor(b[0], a[0], b[1], a[1], rank=1),
                        atol=1e-13)

        for rank, n_args, n_b in zip(local.integers(1, 4, 6),
                                     local.integers(3, 6, 6),
                                     local.integers(1, 8, 6)):
            stack = local.standard_normal((n_args, n_b, *[2] * rank))
            split = int(local.integers(1, n_args - 1))
            base = util.tensor(*stack[split:], rank=rank)
            insr = util.tensor(*stack[:split], rank=rank)
            pos = local.integers(0, split, split)
            want = util.tensor(*np.insert(stack[split:], pos,
                                          stack[:split], axis=0),
                               rank=rank)
            got = util.tensor_merge(
                base, insr, pos=pos, rank=rank,
                arr_dims=[[2] * (n_args - split)] * rank,
                ins_dims=[[2] * split] * rank)
            assert_allclose(got, want, atol=1e-10)

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

    def test_cexp(self):
        """cexp/cexpm1 against np.exp, incl. the cancellation regime
        (cf. reference tests/test_util.py::test_cexp/test_cexpm1)."""
        x = rng.uniform(-10, 10, (7, 11))
        assert_allclose(cexp(x).to_numpy(), np.exp(1j * x), atol=1e-15)
        got = cexpm1(x).to_numpy()
        assert_allclose(got, np.exp(1j * x) - 1, atol=1e-15)
        # tiny arguments: e^{ix}-1 ~ ix; the naive form loses all digits
        tiny = np.array([1e-9, -3e-12, 1e-15, 0.0])
        got = cexpm1(tiny).to_numpy()
        assert_allclose(got.imag, np.sin(tiny), atol=1e-30)
        assert_allclose(got.real, -2 * np.sin(tiny / 2)**2, rtol=1e-12,
                        atol=1e-300)

    def test_remove_float_errors(self):
        for dtype in (np.float64, np.complex128):
            arr = np.zeros((3, 3), dtype=dtype)
            eps = np.finfo(arr.real.dtype).eps
            arr[0, 0] = 0.5 * eps          # below atol=eps*shape[-1]
            arr[1, 1] = 1.0
            cleaned = util.remove_float_errors(arr.copy())
            assert cleaned[0, 0] == 0
            assert cleaned[1, 1] == 1.0
            # custom eps_scale
            arr2 = np.full(4, 10 * eps, dtype=dtype)
            assert (util.remove_float_errors(arr2.copy(), 100) == 0).all()
            assert (util.remove_float_errors(arr2.copy(), 1) != 0).all()
        if np.iscomplexobj(arr):
            arr[0, 1] = 1j * eps
            assert util.remove_float_errors(arr.copy())[0, 1] == 0

    def test_parse_optional_parameters(self):
        @util.parse_optional_parameters(which=('a', 'b'), n=(1, 2))
        def f(x, which='a', n=1):
            return which, n

        assert f(0) == ('a', 1)
        assert f(0, 'b', 2) == ('b', 2)       # positional
        assert f(0, which='b') == ('b', 1)    # keyword
        with pytest.raises(ValueError, match='Invalid value for which'):
            f(0, which='c')
        with pytest.raises(ValueError, match='Should be one of'):
            f(0, 'a', 3)

    def test_parse_operators(self):
        class FakeQobj:
            def __init__(self, a): self.a = np.asarray(a, dtype=complex)
            def full(self): return self.a

        class FakeSparse:
            def __init__(self, a): self.a = np.asarray(a, dtype=complex)
            def todense(self): return self.a

        class FakeQopt:
            def __init__(self, a):
                self.data = np.asarray(a, dtype=complex)
            def dexp(self): pass

        X = util.paulis[1]
        out = util.parse_operators(
            [X, FakeQobj(X), FakeSparse(X), FakeQopt(X), asc(X)], 'test')
        assert out.shape == (5, 2, 2)
        for o in out:
            assert_allclose(o, X, atol=1e-15)
        with pytest.raises(TypeError, match='test'):
            util.parse_operators([object()], 'test')
        with pytest.raises(ValueError, match='square'):
            util.parse_operators([np.zeros((2, 3))], 'test')
        with pytest.raises(ValueError, match='two-dimensional'):
            util.parse_operators([np.zeros((2, 2, 2, 2))], 'test')

    def test_parse_spectrum(self):
        omega = np.linspace(1, 2, 10)
        idx = [0, 1]
        # scalar-per-omega broadcast to every noise oper
        s = util.parse_spectrum(np.ones(10), omega, idx)
        assert s.shape == (10,)
        # per-nop spectra
        s = util.parse_spectrum(np.ones((2, 10)), omega, idx)
        assert s.shape == (2, 10)
        # hermitian cross-spectra pass
        cross = np.ones((2, 2, 10)) + 0j
        cross[0, 1] = 1j
        cross[1, 0] = -1j
        assert util.parse_spectrum(cross, omega, idx).shape == (2, 2, 10)
        # non-hermitian cross-spectra fail
        bad = cross.copy()
        bad[0, 1] = 2j
        with pytest.raises(ValueError, match='[Hh]ermitian'):
            util.parse_spectrum(bad, omega, idx)
        with pytest.raises(ValueError, match='shape'):
            util.parse_spectrum(np.ones((3, 10)), omega, idx)
        with pytest.raises(ValueError, match='shape|dimensions'):
            util.parse_spectrum(np.ones((2, 2, 2, 10)), omega, idx)

    def test_is_sequence_like(self):
        assert util.is_sequence_like([1, 2])
        assert util.is_sequence_like((1,))
        assert util.is_sequence_like(np.arange(3))
        assert util.is_sequence_like('abc')
        assert not util.is_sequence_like(1.0)
        assert not util.is_sequence_like(iter([1]))

    def test_all_array_equal_edge_cases(self):
        a = rng.standard_normal((2, 2))
        # same object many times (the pulse-train fast path)
        assert util.all_array_equal([a] * 1000)
        # equal values, different dtypes -> different bytes
        assert not util.all_array_equal([np.zeros(2, dtype=np.float64),
                                         np.zeros(2, dtype=np.float32)])
        # generator input works
        assert util.all_array_equal(iter([a, a.copy()]))

    def test_oper_equiv_more(self):
        # normalized mode with state vectors
        psi = np.array([[1.0], [0.0]])
        phi = np.exp(1j * 0.5) * psi
        eq, phase = util.oper_equiv(psi, phi, normalized=True)
        assert eq
        assert_allclose(phase, 0.5, rtol=1e-10)
        # proportional operators are equivalent (phase 0)
        eq, phase = util.oper_equiv(util.paulis[1], 2 * util.paulis[1])
        assert eq
        assert_allclose(phase, 0.0, atol=1e-12)
        with pytest.raises(ValueError, match='incompatible'):
            util.oper_equiv(np.eye(2), np.eye(3))

    def test_dot_HS_eps(self):
        u = util.paulis[1]
        # eps rounding: a tiny perturbation rounds away to the integer
        assert util.dot_HS(u, (1 + 1e-15) * u) == 2
        # eps=0 keeps the raw float
        raw = util.dot_HS(u, (1 + 1e-15) * u, eps=0)
        assert raw != 2
        # complex result keeps imaginary part
        val = util.dot_HS(util.paulis[1], 1j * util.paulis[1], eps=0)
        assert np.iscomplexobj(val) and abs(val - 2j) < 1e-12

    def test_integrate_dx(self):
        f = np.ones(11)
        assert_allclose(util.integrate(f, dx=0.1), 1.0, rtol=1e-12)
        z = np.exp(1j * np.linspace(0, 1, 11))
        got = util.integrate(asc(z), np.linspace(0, 1, 11))
        assert isinstance(got, C)
        assert_allclose(got.to_numpy(),
                        np.trapezoid(z, np.linspace(0, 1, 11)), rtol=1e-10)

    def test_progressbar_range(self):
        assert list(util.progressbar_range(3)) == [0, 1, 2]
        assert list(util.progressbar_range(1, 7, 2,
                                           show_progressbar=True)) == \
            [1, 3, 5]
        # progressbar falls back to the bare iterable without tqdm
        assert list(util.progressbar([0, 1])) == [0, 1]

    def test_mdot_axis(self):
        mats = rand_unit(3, 4)
        stacked = np.swapaxes(mats, 0, 1)[:, :, None]  # axis-shuffled view
        want = mats[0] @ mats[1] @ mats[2] @ mats[3]
        assert_allclose(util.mdot(mats, axis=0), want, atol=1e-14)

    def test_tensor_merge_errors(self):
        I, X, Y, Z = util.paulis
        with pytest.raises(ValueError):
            util.tensor_merge(util.tensor(X, Y), util.tensor(I, I),
                              pos=[0], arr_dims=[[2, 2], [2, 2]],
                              ins_dims=[[2, 2], [2, 2]])

    @pytest.mark.skipif(not HAVE_REFERENCE, reason='reference unavailable')
    def test_util_matches_reference(self):
        from filter_functions import util as ref_util
        x = rng.uniform(-5, 5, 30)
        assert_allclose(cexp(x).to_numpy(), ref_util.cexp(x), atol=1e-15)
        assert_allclose(cexpm1(x).to_numpy(), ref_util.cexpm1(x),
                        atol=1e-15)
        a = rng.standard_normal((4, 4))
        assert_allclose(util.remove_float_errors(a.copy()),
                        ref_util.remove_float_errors(a.copy()), atol=0)

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


class TestMemoryBudget:
    """Device-aware chunking budget (config.memory_budget)."""

    def test_env_override(self, monkeypatch):
        from filter_functions_tpu import config
        monkeypatch.setenv('FF_TPU_MEMORY_BUDGET', '512M')
        assert config.memory_budget() == 512 << 20
        monkeypatch.setenv('FF_TPU_MEMORY_BUDGET', '2G')
        assert config.memory_budget() == 2 << 30
        monkeypatch.setenv('FF_TPU_MEMORY_BUDGET', '1048576')
        assert config.memory_budget() == 1 << 20

    def test_scales_with_device_memory(self, monkeypatch):
        from filter_functions_tpu import config
        monkeypatch.delenv('FF_TPU_MEMORY_BUDGET', raising=False)
        # 16 GB chip at the default 1/8 fraction -> the tuned 2 GiB
        monkeypatch.setattr(config, 'device_memory_bytes',
                            lambda: 16 << 30)
        assert config.memory_budget() == 2 << 30
        # small chip scales down instead of silently overcommitting
        monkeypatch.setattr(config, 'device_memory_bytes',
                            lambda: 8 << 30)
        assert config.memory_budget() == 1 << 30
        # clamped below
        monkeypatch.setattr(config, 'device_memory_bytes',
                            lambda: 128 << 20)
        assert config.memory_budget() == 64 << 20

    def test_fallback_when_unreported(self, monkeypatch):
        from filter_functions_tpu import config
        monkeypatch.delenv('FF_TPU_MEMORY_BUDGET', raising=False)
        monkeypatch.setattr(config, 'device_memory_bytes', lambda: 0)
        assert config.memory_budget() == 2 << 30
        assert config.memory_budget(fraction=1/16,
                                    fallback=1 << 30) == 1 << 30

    def test_pick_chunk_uses_budget(self, monkeypatch):
        from filter_functions_tpu import numeric
        monkeypatch.setenv('FF_TPU_MEMORY_BUDGET', '64M')
        small = numeric._pick_chunk(1000, 4000, 16)
        monkeypatch.setenv('FF_TPU_MEMORY_BUDGET', '4G')
        large = numeric._pick_chunk(1000, 4000, 16)
        assert small < large
        assert numeric._pick_chunk(10, 100, 2) == 10  # G caps the chunk
