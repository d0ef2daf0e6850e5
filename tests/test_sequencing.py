"""Concatenation, periodic repetition, remap and extend tests
(mirroring the strategy of the reference's tests/test_sequencing.py)."""
import warnings

import numpy as np
import pytest

import filter_functions_tpu as ff
from conftest import HAVE_REFERENCE
from testutil import (assert_allclose, make_pulse, pulse_pair,
                      rand_pulse_arrays, rand_pulse_sequence, rng, sigma,
                      to_np)


class TestConcatenation:
    def test_matmul_equals_concatenate(self):
        a = rand_pulse_sequence(2, 4)
        b = ff.PulseSequence.from_arrays(
            a.c_opers, a.c_oper_identifiers, rng.standard_normal((3, 5)),
            a.n_opers, a.n_oper_identifiers, rng.random((3, 5)),
            1 - rng.random(5), a.basis)
        assert (a @ b) == ff.concatenate((a, b))

    def test_slice_reconcatenation(self):
        pulse = rand_pulse_sequence(2, 6)
        omega = np.linspace(0.5, 20, 31)
        full = to_np(pulse.get_filter_function(omega))
        parts = ff.concatenate([pulse[i] for i in range(len(pulse))])
        assert_allclose(to_np(parts.get_filter_function(omega)), full,
                        atol=1e-12)

    def test_slicing_semantics(self):
        """__getitem__ over slices, steps, boolean masks, plus raises
        (cf. reference test_sequencing.py:95-131)."""
        pulse = rand_pulse_sequence(2, 8)
        parts = [p for p in pulse]
        assert len(pulse) == 8 and len(parts) == 8
        assert ff.concatenate(parts) == pulse
        assert pulse[3] == parts[3]
        assert pulse == ff.concatenate([pulse[:3], pulse[3:]])
        assert pulse[::-1] == ff.concatenate(parts[::-1])
        mask = np.array([1, 0, 1, 0, 1, 1, 0, 1], bool)
        assert pulse[mask] == ff.concatenate(
            [p for p, b in zip(parts, mask) if b])
        for bad in (slice(0, 0), (1, 3), 'a'):
            with pytest.raises(IndexError):
                pulse[bad]
        with pytest.raises(IndexError):
            pulse[np.zeros(8, bool)]

    def test_prefix_slice_cache_reuse(self):
        """pulse[:i] reuses the cumulative per-step control matrix and
        second-order FF intermediates; values equal from-scratch
        (reference test_sequencing.py:141-159)."""
        from filter_functions_tpu import util
        pulse = rand_pulse_sequence(3, 6, 2, 2)
        omega = util.get_sample_frequencies(pulse, 11)
        pulse.cache_control_matrix(omega, cache_intermediates=True)
        pulse.cache_filter_function(omega, order=2,
                                    cache_intermediates=True,
                                    cache_second_order_cumulative=True)
        for i in range(1, len(pulse)):
            slc = pulse[:i]
            assert slc.is_cached('control_matrix')
            assert slc.is_cached('filter_function_2')
            cm = to_np(slc.get_control_matrix(omega))
            f2 = to_np(slc.get_filter_function(omega, order=2))
            slc.cleanup('all')
            assert_allclose(cm, to_np(slc.get_control_matrix(omega)),
                            atol=1e-13)
            assert_allclose(f2, to_np(slc.get_filter_function(omega,
                                                              order=2)),
                            atol=1e-13)

    def test_pulse_sequence_object_array(self):
        pulses = [rand_pulse_sequence(2, 3) for _ in range(8)]
        array = np.array(pulses)
        assert array.dtype == np.dtype('O')
        assert array.shape == (8,)

    def test_cached_vs_scratch(self):
        """Concatenating pulses with cached control matrices must give
        the same FF as computing the merged pulse from scratch."""
        omega = np.linspace(0.1, 10, 27)
        arrays = [rand_pulse_arrays(2, 3) for _ in range(3)]
        # same noise Hamiltonian for all segments
        for arr in arrays[1:]:
            arr[3][:] = arrays[0][3]
            arr[4][:] = arrays[0][4]
        pulses = [make_pulse(a) for a in arrays]
        for p in pulses:
            p.cache_filter_function(omega)
        combined = ff.concatenate(pulses)
        assert combined.is_cached('filter function')
        cached_ff = to_np(combined.get_filter_function(omega))

        scratch = ff.concatenate_without_filter_function(pulses)
        scratch_ff = to_np(scratch.get_filter_function(omega))
        assert_allclose(cached_ff, scratch_ff, atol=1e-11)

    def test_pulse_correlation_ff_sums_to_total(self):
        omega = np.linspace(0.1, 10, 21)
        pulses = []
        base = rand_pulse_arrays(2, 3)
        for _ in range(3):
            arr = rand_pulse_arrays(2, 3)
            pulses.append(make_pulse((arr[0], arr[1], arr[2], base[3],
                                      base[4], arr[5], arr[6])))
        for p in pulses:
            p.cache_filter_function(omega)
        combined = ff.concatenate(pulses, calc_pulse_correlation_FF=True)
        f_pc = to_np(combined.get_pulse_correlation_filter_function())
        total = to_np(combined.get_filter_function(omega))
        assert_allclose(f_pc.sum(axis=(0, 1)), total, atol=1e-12)
        # correlation infidelities sum to total infidelity
        spectrum = 1 / (1 + omega**2)
        i_corr = np.asarray(ff.infidelity(combined, spectrum, omega,
                                          which='correlations'))
        i_tot = np.asarray(ff.infidelity(combined, spectrum, omega))
        assert_allclose(i_corr.sum(axis=(0, 1)), i_tot, rtol=1e-10)

    def test_different_n_opers(self):
        """Pulses with different noise operators: missing ones computed
        from scratch during concatenation."""
        omega = np.linspace(0.5, 10, 19)
        local = np.random.default_rng(11)
        a1 = rand_pulse_arrays(2, 3, n_nops=2, local_rng=local)
        a2 = rand_pulse_arrays(2, 4, n_nops=2, local_rng=local)
        # share one noise oper/identifier; constant sensitivities so the
        # missing ones can be inferred on the other pulse's segments.
        # Deterministic identifiers: random draws can collide with the
        # other pulse's second identifier and break construction.
        a1[4][:] = ['a', 'b']
        a2[4][:] = ['a', 'c']
        a2[3][0] = a1[3][0]
        a1[5][:] = a1[5][:, :1]
        a2[5][:] = a2[5][:, :1]
        a2[5][0] = a1[5][0][0]
        p1, p2 = make_pulse(a1), make_pulse(a2)
        p1.cache_filter_function(omega)
        p2.cache_filter_function(omega)
        combined = ff.concatenate([p1, p2])
        got = to_np(combined.get_filter_function(omega))
        scratch = ff.concatenate_without_filter_function([p1, p2])
        want = to_np(scratch.get_filter_function(omega))
        assert_allclose(got, want, atol=1e-11)

    @pytest.mark.parametrize('repeats', [1, 2, 7, 20])
    def test_periodic_vs_standard(self, repeats):
        omega = np.linspace(0.1, 10, 25)
        pulse = rand_pulse_sequence(2, 3)
        pulse.cache_filter_function(omega)
        per = ff.concatenate_periodic(pulse, repeats)
        std = ff.concatenate([pulse] * repeats) if repeats > 1 else pulse
        assert_allclose(to_np(per.get_filter_function(omega)),
                        to_np(std.get_filter_function(omega)), atol=1e-10)

    def test_concatenate_spin_echo_caching_byproducts(self):
        """Concatenating cached spin echos equals the directly built
        CPMG pulse, and byproduct caches (total phases / propagator /
        Liouville rep) are populated on inputs and output
        (cf. reference test_sequencing.py:222-264)."""
        from testutil import generate_dd_hamiltonian
        tau, tau_pi, omega = 10, 1e-4, np.logspace(-1, 2, 200)
        H_c_SE, dt_SE = generate_dd_hamiltonian(1, tau=tau, tau_pi=tau_pi,
                                                dd_type='cpmg')
        H_n_SE = [[sigma[3], np.ones_like(dt_SE)]]
        se_1 = ff.PulseSequence(H_c_SE, H_n_SE, dt_SE)
        se_2 = ff.PulseSequence(H_c_SE, H_n_SE, dt_SE)
        H_c_CPMG, dt_CPMG = generate_dd_hamiltonian(
            2, tau=2 * tau, tau_pi=tau_pi, dd_type='cpmg')
        H_n_CPMG = [[sigma[3], np.ones_like(dt_CPMG)]]
        cpmg = ff.PulseSequence(H_c_CPMG, H_n_CPMG, dt_CPMG)

        # cache only the first SE: the second is computed from scratch
        se_1.cache_filter_function(omega)
        cpmg.cache_filter_function(omega)
        combined = se_1 @ se_2

        for p in (se_1, cpmg, combined):
            assert p.is_cached('total_phases')
            assert p.is_cached('total_propagator')
            assert p.is_cached('total_propagator_liouville')
        assert combined == cpmg
        assert_allclose(to_np(combined.get_filter_function(omega)),
                        to_np(cpmg.get_filter_function(omega)), rtol=1e-11,
                        atol=1e-16)

        # neither cached: concatenation computes everything from scratch
        se_3 = ff.PulseSequence(H_c_SE, H_n_SE, dt_SE)
        se_4 = ff.PulseSequence(H_c_SE, H_n_SE, dt_SE)
        combined2 = ff.concatenate([se_3, se_4], omega=omega,
                                   calc_filter_function=True)
        assert combined2.is_cached('filter function')
        assert_allclose(to_np(combined2.get_filter_function(omega)),
                        to_np(cpmg.get_filter_function(omega)), rtol=1e-11,
                        atol=1e-16)

    @pytest.mark.skipif(not HAVE_REFERENCE, reason='reference unavailable')
    def test_concatenation_reference_parity(self):
        import filter_functions as ref
        omega = np.linspace(0.1, 10, 23)
        arrays = [rand_pulse_arrays(2, 3) for _ in range(3)]
        for arr in arrays[1:]:
            arr[3][:] = arrays[0][3]
            arr[4][:] = arrays[0][4]
        ours = [make_pulse(a) for a in arrays]
        theirs = [make_pulse(a, cls=ref) for a in arrays]
        for o, t in zip(ours, theirs):
            o.cache_filter_function(omega)
            t.cache_filter_function(omega)
        got = ff.concatenate(ours, calc_pulse_correlation_FF=True)
        want = ref.concatenate(theirs, calc_pulse_correlation_FF=True)
        assert_allclose(
            to_np(got.get_pulse_correlation_filter_function()),
            want.get_pulse_correlation_filter_function(), atol=1e-12)


class TestRemapExtend:
    def test_remap_roundtrip(self):
        pulse = rand_pulse_sequence(4, 3, btype='Pauli')
        omega = np.linspace(0.5, 10, 11)
        pulse.cache_filter_function(omega)
        swapped = ff.remap(pulse, (1, 0))
        back = ff.remap(swapped, (1, 0))
        assert back == pulse
        assert swapped.is_cached('filter function')
        assert_allclose(to_np(back.get_filter_function(omega)),
                        to_np(pulse.get_filter_function(omega)), atol=1e-12)

    def test_remap_control_matrix_permutation(self):
        """Remapped cached control matrix equals the control matrix of
        the remapped pulse computed from scratch."""
        pulse = rand_pulse_sequence(4, 3, btype='Pauli')
        omega = np.linspace(0.5, 10, 11)
        pulse.cache_filter_function(omega)
        swapped = ff.remap(pulse, (1, 0))
        cached = to_np(swapped.get_control_matrix(omega))
        fresh = ff.PulseSequence.from_arrays(
            swapped.c_opers, swapped.c_oper_identifiers, swapped.c_coeffs,
            swapped.n_opers, swapped.n_oper_identifiers, swapped.n_coeffs,
            swapped.dt, swapped.basis)
        scratch = to_np(fresh.get_control_matrix(omega))
        assert_allclose(cached, scratch, atol=1e-11)

    def test_extend_single_to_two_qubits(self):
        """FF of an extended pulse: cached extension == from-scratch."""
        x = sigma[1]
        z = sigma[3]
        pulse = ff.PulseSequence([[x, [np.pi / 2], 'X']],
                                 [[x, [1.0], 'X'], [z, [1.0], 'Z']],
                                 [1], basis=ff.Basis.pauli(1))
        omega = np.linspace(0.5, 10, 15)
        pulse.cache_filter_function(omega)
        xx = ff.extend([(pulse, 0), (pulse, 1)])
        assert xx.d == 4
        assert xx.is_cached('filter function')
        cached = to_np(xx.get_filter_function(omega))
        fresh = ff.PulseSequence.from_arrays(
            xx.c_opers, xx.c_oper_identifiers, xx.c_coeffs,
            xx.n_opers, xx.n_oper_identifiers, xx.n_coeffs, xx.dt,
            xx.basis)
        scratch = to_np(fresh.get_filter_function(omega))
        assert_allclose(cached, scratch, atol=1e-10)

    @pytest.mark.skipif(not HAVE_REFERENCE, reason='reference unavailable')
    def test_extend_reference_parity(self):
        import filter_functions as ref
        x, z = sigma[1], sigma[3]
        omega = np.linspace(0.5, 10, 9)

        def build(mod):
            p = mod.PulseSequence([[x, [np.pi / 2], 'X']],
                                  [[x, [1.0], 'X'], [z, [1.0], 'Z']],
                                  [1], basis=mod.Basis.pauli(1))
            p.cache_filter_function(omega)
            return mod.extend([(p, 0), (p, 2)], N=3)

        got = build(ff)
        want = build(ref)
        assert_allclose(to_np(got.get_filter_function(omega)),
                        want.get_filter_function(omega), atol=1e-10)
        assert list(got.n_oper_identifiers) == list(
            want.n_oper_identifiers)


class TestSecondOrderConcatenation:
    """K11: second-order FF concatenation rule vs reference
    (numeric.py:1702-1818)."""

    @pytest.mark.skipif(not HAVE_REFERENCE, reason='reference unavailable')
    def test_second_order_concat_parity(self):
        import filter_functions as ref
        omega = np.linspace(0.5, 5, 11)
        base = rand_pulse_arrays(2, 2)
        arrays = []
        for _ in range(3):
            arr = rand_pulse_arrays(2, 2)
            arrays.append((arr[0], arr[1], arr[2], base[3], base[4],
                           base[5], arr[6]))
        ours = [make_pulse(a) for a in arrays]
        theirs = [make_pulse(a, cls=ref) for a in arrays]
        for o, t in zip(ours, theirs):
            o.get_control_matrix(omega, cache_intermediates=True)
            o.get_filter_function(omega, order=2, cache_intermediates=True)
            t.get_control_matrix(omega, cache_intermediates=True)
            t.get_filter_function(omega, order=2, cache_intermediates=True)
        got_pulse = ff.concatenate(ours, calc_second_order_FF=True)
        want_pulse = ref.concatenate(theirs, calc_second_order_FF=True)
        got = to_np(got_pulse.get_filter_function(omega, order=2))
        want = want_pulse.get_filter_function(omega, order=2)
        assert_allclose(got, want, atol=1e-11)

    def test_second_order_concat_many_ragged_pulses(self):
        """16 atomic pulses with ragged segment counts through the
        batched K11 path (numeric.py concatenation rule) == scratch."""
        omega = np.linspace(0.5, 5, 7)
        base = rand_pulse_arrays(2, 2)
        arrays = []
        for i in range(16):
            arr = rand_pulse_arrays(2, 1 + i % 3)  # ragged n_dt: 1, 2, 3
            n_coeffs = np.broadcast_to(base[5][:, :1],
                                       arr[5].shape).copy()
            arrays.append((arr[0], arr[1], arr[2], base[3], base[4],
                           n_coeffs, arr[6]))
        pulses = [make_pulse(a) for a in arrays]
        for p in pulses:
            p.get_control_matrix(omega, cache_intermediates=True)
            p.get_filter_function(omega, order=2, cache_intermediates=True)
        combined = ff.concatenate(pulses, calc_second_order_FF=True)
        got = to_np(combined.get_filter_function(omega, order=2))
        scratch = ff.concatenate_without_filter_function(pulses)
        want = to_np(scratch.get_filter_function(omega, order=2))
        assert_allclose(got, want, atol=1e-11)

    def test_second_order_concat_equals_scratch(self):
        """Concatenated second-order FF == second-order FF of the
        merged pulse computed from scratch."""
        omega = np.linspace(0.5, 5, 9)
        base = rand_pulse_arrays(2, 2)
        arrays = []
        for _ in range(2):
            arr = rand_pulse_arrays(2, 2)
            arrays.append((arr[0], arr[1], arr[2], base[3], base[4],
                           base[5], arr[6]))
        pulses = [make_pulse(a) for a in arrays]
        for p in pulses:
            p.get_control_matrix(omega, cache_intermediates=True)
            p.get_filter_function(omega, order=2, cache_intermediates=True)
        combined = ff.concatenate(pulses, calc_second_order_FF=True)
        got = to_np(combined.get_filter_function(omega, order=2))
        scratch = ff.concatenate_without_filter_function(pulses)
        want = to_np(scratch.get_filter_function(omega, order=2))
        assert_allclose(got, want, atol=1e-11)


class TestHamiltonianMerging:
    """Identifier clash resolution and sensitivity inference
    (pulse_sequence.py:1340-1483 semantics)."""

    def test_same_oper_different_id_errors(self):
        X, Z = sigma[1], sigma[3]
        a = ff.PulseSequence([[X, [1.0], 'X1']], [[Z, [1.0], 'Z']], [1.0])
        b = ff.PulseSequence([[X, [1.0], 'X2']], [[Z, [1.0], 'Z']], [1.0])
        with pytest.raises(ValueError):
            ff.concatenate_without_filter_function([a, b])

    def test_same_id_different_oper_suffixed(self):
        X, Y, Z = sigma[1], sigma[2], sigma[3]
        a = ff.PulseSequence([[X, [1.0], 'ctrl']], [[Z, [1.0], 'Z']], [1.0])
        b = ff.PulseSequence([[Y, [1.0], 'ctrl']], [[Z, [1.0], 'Z']], [1.0])
        c = ff.concatenate_without_filter_function([a, b])
        ids = sorted(c.c_oper_identifiers.tolist())
        assert ids == ['ctrl_0', 'ctrl_1']

    def test_constant_sensitivity_inference(self):
        X, Y, Z = sigma[1], sigma[2], sigma[3]
        # pulse b lacks the Y noise oper; its constant sensitivity 0.5
        # from a is inferred for b's segments
        a = ff.PulseSequence([[X, [1.0], 'X']],
                             [[Z, [1.0], 'Z'], [Y, [0.5], 'Y']], [1.0])
        b = ff.PulseSequence([[X, [2.0], 'X']], [[Z, [1.0], 'Z']], [1.0])
        c = ff.concatenate_without_filter_function([a, b])
        y_row = c.n_coeffs[list(c.n_oper_identifiers).index('Y')]
        assert_allclose(y_row, [0.5, 0.5])

    def test_nonconstant_sensitivity_errors(self):
        X, Y, Z = sigma[1], sigma[2], sigma[3]
        a = ff.PulseSequence([[X, [1.0, 1.0], 'X']],
                             [[Z, [1.0, 1.0], 'Z'], [Y, [0.5, 0.7], 'Y']],
                             [1.0, 1.0])
        b = ff.PulseSequence([[X, [2.0], 'X']], [[Z, [1.0], 'Z']], [1.0])
        with pytest.raises(ValueError):
            ff.concatenate_without_filter_function([a, b])

    def test_concatenate_type_errors(self):
        p = rand_pulse_sequence(2, 2)
        with pytest.raises(TypeError):
            ff.concatenate_without_filter_function(42)
        with pytest.raises(TypeError):
            ff.concatenate_without_filter_function([p, 'not a pulse'])
        q = rand_pulse_sequence(3, 2)
        with pytest.raises(ValueError):
            ff.concatenate_without_filter_function([p, q])

    def test_single_pulse_concatenate_is_copy(self):
        p = rand_pulse_sequence(2, 3)
        c = ff.concatenate([p])
        assert c == p and c is not p

    def test_uniform_train_equals_general_and_scratch(self):
        """concatenate([p] * G) takes the closed-form uniform branch;
        it must agree with the general path (distinct pulse objects)
        and with a from-scratch computation on the merged pulse."""
        import copy
        omega = np.linspace(0.1, 10, 25)
        pulse = rand_pulse_sequence(2, 3)
        pulse.cache_filter_function(omega)
        G = 6
        fast = ff.concatenate([pulse] * G)
        general = ff.concatenate([copy.deepcopy(pulse) for _ in range(G)])
        assert_allclose(to_np(fast.get_filter_function(omega)),
                        to_np(general.get_filter_function(omega)),
                        atol=1e-10)
        scratch = ff.concatenate_without_filter_function([pulse] * G)
        scratch.cache_filter_function(omega)
        assert_allclose(to_np(fast.get_filter_function(omega)),
                        to_np(scratch.get_filter_function(omega)),
                        atol=1e-10)
        assert fast.dt.shape == (3 * G,)
        assert fast.tau == pytest.approx(G * pulse.tau)
        assert_allclose(to_np(fast.total_propagator),
                        to_np(general.total_propagator), atol=1e-12)

    def test_uniform_train_decision_semantics(self):
        """The uniform branch must mirror the general path's
        calc_filter_function / omega decision logic."""
        omega = np.linspace(0.1, 10, 25)
        pulse = rand_pulse_sequence(2, 3)       # nothing cached
        out = ff.concatenate([pulse] * 4)
        assert not out.is_cached('filter_function')
        with pytest.raises(ValueError):
            ff.concatenate([pulse] * 4, calc_filter_function=True)
        out = ff.concatenate([pulse] * 4, calc_filter_function=True,
                             omega=omega)
        assert out.is_cached('filter_function')
        pulse.cache_filter_function(omega)
        out = ff.concatenate([pulse] * 4, calc_filter_function=False)
        assert not out.is_cached('filter_function')
        # cached total propagator still carried over without the FF
        assert out.is_cached('total_propagator')
        out = ff.concatenate([pulse] * 4)        # auto: cached ctrl mat
        assert out.is_cached('filter_function')

    def test_uniform_train_mappings(self):
        """concatenate_without_filter_function's uniform branch returns
        identity identifier mappings keyed by pulse position."""
        pulse = rand_pulse_sequence(2, 3)
        newpulse, cmap, nmap = ff.concatenate_without_filter_function(
            [pulse] * 5, return_identifier_mappings=True)
        assert set(cmap) == set(range(5)) and set(nmap) == set(range(5))
        for i in range(5):
            assert cmap[i] == {str(s): str(s)
                               for s in pulse.c_oper_identifiers}
            assert nmap[i] == {str(s): str(s)
                               for s in pulse.n_oper_identifiers}
        assert newpulse.dt.shape == (15,)


class TestRemapCachingAndAccuracy:
    """Cache retention under remap and 3-qubit accuracy with identifier
    mapping (cf. reference test_sequencing.py:1342-1447)."""

    ATTRS = ('omega', 'eigvals', 'eigvecs', 'propagators', 'total_phases',
             'total_propagator', 'filter function',
             'total_propagator_liouville', 'control_matrix')

    def test_cache_retention(self):
        from filter_functions_tpu import util
        pauli = rand_pulse_sequence(4, 1, 1, 4, 'Pauli')
        ggm = rand_pulse_sequence(4, 1, 1, 4, 'GGM')

        # nothing cached on either side
        remapped = ff.remap(pauli, (1, 0))
        for attr in self.ATTRS:
            assert pauli.is_cached(attr) == remapped.is_cached(attr)

        omega = util.get_sample_frequencies(pauli, n_samples=30)
        pauli.cache_filter_function(omega)
        remapped = ff.remap(pauli, (1, 0))
        for attr in self.ATTRS:
            assert pauli.is_cached(attr) == remapped.is_cached(attr), attr

        # GGM basis: frequency-domain caches dropped with a warning
        omega = util.get_sample_frequencies(ggm, n_samples=30)
        ggm.cache_filter_function(omega)
        with pytest.warns(UserWarning):
            remapped = ff.remap(ggm, (1, 0))
        for attr in self.ATTRS[:-2]:
            assert ggm.is_cached(attr) == remapped.is_cached(attr), attr
        for attr in self.ATTRS[-2:]:
            assert not remapped.is_cached(attr), attr

    @pytest.mark.parametrize('order', [(1, 0, 2), (2, 0, 1), (1, 2, 0)])
    def test_three_qubit_accuracy(self, order):
        from filter_functions_tpu import util
        paulis = np.array(util.paulis)
        I, X, Y, Z = paulis
        local = np.random.default_rng(17)
        amps = local.standard_normal(3)
        pulse = ff.PulseSequence(
            [[util.tensor(X, Y, Z), amps]],
            [[util.tensor(X, I, I), np.ones_like(amps), 'XII'],
             [util.tensor(I, X, I), np.ones_like(amps), 'IXI'],
             [util.tensor(I, I, X), np.ones_like(amps), 'IIX']],
            np.ones_like(amps), ff.Basis.pauli(3))
        omega = util.get_sample_frequencies(pulse, 30)
        pulse.cache_filter_function(omega)

        order = list(order)
        reordered = ff.PulseSequence(
            [[util.tensor(*paulis[1:][order]), amps]],
            [[util.tensor(*paulis[[1, 0, 0]][order]), np.ones_like(amps),
              ''.join('XII'[o] for o in order)],
             [util.tensor(*paulis[[0, 1, 0]][order]), np.ones_like(amps),
              ''.join('IXI'[o] for o in order)],
             [util.tensor(*paulis[[0, 0, 1]][order]), np.ones_like(amps),
              ''.join('IIX'[o] for o in order)]],
            np.ones_like(amps), ff.Basis.pauli(3))
        reordered.cache_filter_function(omega)

        remapped = ff.remap(
            pulse, order,
            oper_identifier_mapping={
                'A_0': 'A_0',
                'XII': ''.join('XII'[o] for o in order),
                'IXI': ''.join('IXI'[o] for o in order),
                'IIX': ''.join('IIX'[o] for o in order)})

        assert reordered == remapped
        assert reordered.d == remapped.d
        assert reordered.basis == remapped.basis
        assert_allclose(np.asarray(reordered.omega),
                        np.asarray(remapped.omega))
        assert_allclose(to_np(remapped.propagators),
                        to_np(reordered.propagators), atol=1e-13)
        assert_allclose(to_np(remapped.total_propagator),
                        to_np(reordered.total_propagator), atol=1e-13)
        assert_allclose(np.asarray(remapped.total_propagator_liouville),
                        np.asarray(reordered.total_propagator_liouville),
                        atol=1e-13)
        assert_allclose(to_np(remapped.get_total_phases(omega)),
                        to_np(reordered.get_total_phases(omega)),
                        atol=1e-13)
        assert_allclose(to_np(remapped.get_control_matrix(omega)),
                        to_np(reordered.get_control_matrix(omega)),
                        atol=1e-11)
        assert_allclose(to_np(remapped.get_filter_function(omega)),
                        to_np(reordered.get_filter_function(omega)),
                        atol=1e-11)


class TestExtendWithIdentity:
    """Extending a 1-qubit pulse into an N-qubit register equals the
    explicitly built big-register pulse, with caches carried over
    (cf. reference test_sequencing.py:804-918)."""

    @pytest.mark.parametrize('N,target', [(2, 0), (2, 1), (3, 1)])
    def test_extend_matches_explicit(self, N, target):
        from filter_functions_tpu import util
        ID, X, Y, Z = util.paulis
        n_dt = 6
        local = np.random.default_rng(5 + N + target)
        coeffs = local.standard_normal((3, n_dt))
        ids = ['X', 'Y', 'Z']
        pulse = ff.PulseSequence(
            list(zip((X, Y, Z), coeffs, ids)),
            list(zip((X, Y, Z), np.ones((3, n_dt)), ids)),
            np.ones(n_dt), basis=ff.Basis.pauli(1))
        omega = util.get_sample_frequencies(pulse, n_samples=30)

        ext_opers = util.tensor(*np.insert(
            np.tile(ID, (N - 1, 3, 1, 1)), target, (X, Y, Z), axis=0))
        ext_ids = [i + f'_{target}' for i in ids]
        ext_pulse = ff.PulseSequence(
            list(zip(ext_opers, coeffs, ext_ids)),
            list(zip(ext_opers, np.ones((3, n_dt)), ext_ids)),
            np.ones(n_dt), basis=ff.Basis.pauli(N))

        # default: target-qubit suffix on identifiers, no caches
        test = ff.extend([(pulse, target)], N)
        assert list(test.c_oper_identifiers) == ext_ids
        assert test == ext_pulse
        for key in ('eigvals', 'propagators', 'total_propagator',
                    'control_matrix', 'filter function'):
            assert not test.is_cached(key)

        # custom identifier mapping
        mapping = {i: 'M' + i for i in ids}
        test_m = ff.extend([(pulse, target, mapping)], N)
        assert list(test_m.c_oper_identifiers) == ['MX', 'MY', 'MZ']

        # cached input -> cached, correct output
        pulse.cache_filter_function(omega)
        ext_pulse.cache_filter_function(omega)
        test = ff.extend([(pulse, target)], N)
        for key in ('eigvals', 'propagators', 'total_propagator',
                    'total_propagator_liouville', 'total_phases',
                    'control_matrix', 'filter function'):
            assert test.is_cached(key), key
        assert_allclose(to_np(test.propagators),
                        to_np(ext_pulse.propagators), atol=1e-13)
        assert_allclose(to_np(test.total_propagator),
                        to_np(ext_pulse.total_propagator), atol=1e-13)
        assert_allclose(np.asarray(test.total_propagator_liouville),
                        np.asarray(ext_pulse.total_propagator_liouville),
                        atol=1e-12)
        assert_allclose(to_np(test.get_total_phases(omega)),
                        to_np(ext_pulse.get_total_phases(omega)),
                        atol=1e-13)
        assert_allclose(to_np(test.get_control_matrix(omega)),
                        to_np(ext_pulse.get_control_matrix(omega)),
                        atol=1e-11)
        assert_allclose(to_np(test.get_filter_function(omega)),
                        to_np(ext_pulse.get_filter_function(omega)),
                        atol=1e-10)

    def test_extend_caching_decision_matrix(self):
        """cache_diagonalization / cache_filter_function inference and
        overrides (reference test_sequencing.py:918-1018)."""
        from filter_functions_tpu import util
        p1 = rand_pulse_sequence(2, 5, btype='Pauli')
        p2 = rand_pulse_sequence(2, 5, btype='Pauli')
        p2.dt = p1.dt
        omega = util.get_sample_frequencies(p1, 30)
        diag_keys = ('eigvals', 'eigvecs', 'propagators',
                     'total_propagator')
        ff_keys = ('total_propagator_liouville', 'total_phases',
                   'control_matrix', 'filter function')

        # neither diagonalized: nothing cached
        p1.diagonalize()
        ext = ff.extend([(p1, 0), (p2, 1)])
        assert not any(ext.is_cached(k) for k in diag_keys + ff_keys)
        # override: force diagonalization
        ext = ff.extend([(p1, 0), (p2, 1)], cache_diagonalization=True)
        assert all(ext.is_cached(k) for k in diag_keys)
        assert not any(ext.is_cached(k) for k in ff_keys)
        # both diagonalized: inferred
        p2.diagonalize()
        ext = ff.extend([(p1, 0), (p2, 1)])
        assert all(ext.is_cached(k) for k in diag_keys)
        assert not any(ext.is_cached(k) for k in ff_keys)
        # forced off: total_propagator still carried
        ext = ff.extend([(p1, 0), (p2, 1)], cache_diagonalization=False)
        assert not any(ext.is_cached(k)
                       for k in ('eigvals', 'eigvecs', 'propagators'))
        assert ext.is_cached('total_propagator')

        # FF cached on one: not inferred
        p1.cache_filter_function(omega)
        ext = ff.extend([(p1, 0), (p2, 1)])
        assert not any(ext.is_cached(k) for k in ff_keys)
        # override with omega: cached
        ext = ff.extend([(p1, 0), (p2, 1)], cache_filter_function=True,
                        omega=omega)
        assert all(ext.is_cached(k) for k in ff_keys)
        # FF cached on both: inferred
        p2.cache_filter_function(omega)
        ext = ff.extend([(p1, 0), (p2, 1)])
        assert all(ext.is_cached(k) for k in ff_keys)
        # forced off
        ext = ff.extend([(p1, 0), (p2, 1)], cache_filter_function=False)
        assert not any(ext.is_cached(k) for k in ff_keys)
        # extended FF equals the from-scratch computation
        ext_cached = ff.extend([(p1, 0), (p2, 1)])
        got = to_np(ext_cached.get_filter_function(omega))
        ext_cached.cleanup('all')
        want = to_np(ext_cached.get_filter_function(omega))
        assert_allclose(got, want, atol=1e-11)


class TestExtendErrors:
    def test_extend_exceptions(self):
        """Every failure mode pinned by the reference
        (test_sequencing.py:1244-1341)."""
        from filter_functions_tpu import util
        X = util.paulis[1]
        n_dt = 5
        omega = np.linspace(0.1, 1, 20)
        p1 = rand_pulse_sequence(2, n_dt, btype='Pauli')
        p1.cache_filter_function(omega)
        p11 = ff.extend([[p1, 0], [p1, 1]])
        p11.cache_filter_function(omega + 1)
        p_ggm = rand_pulse_sequence(2, n_dt, btype='GGM')

        with pytest.raises(ValueError, match='remap'):
            # qubit indices don't match on the pulse being remapped
            ff.extend([(p11, (2, 1, 0))])
        with pytest.raises(ValueError, match='dimension'):
            ff.extend([(p1, (0, 1))])
        with pytest.raises(ValueError, match='d_per_qubit'):
            ff.extend([(p1, (0,))], d_per_qubit=3)
        with pytest.raises(ValueError, match='dimension'):
            ff.extend([(p11, (0,))])
        with pytest.raises(ValueError, match='same time steps'):
            ff.extend([(p1, 0), [p_ggm, 1]])
        with pytest.raises(ValueError, match='[Qq]ubit clash'):
            ff.extend([(p1, 0), [p1, 0]])
        with pytest.raises(ValueError, match='N smaller'):
            ff.extend([(p1, 2)], N=2)
        with pytest.raises(ValueError, match='omega'):
            # filter function requested but omegas disagree
            ff.extend([(p1, 0), (p11, (1, 2))],
                      cache_filter_function=True, omega=None)
        with pytest.raises(ValueError):
            # additional noise requires diagonalization
            ff.extend([(p1, 0), (p1, 1)], cache_diagonalization=False,
                      additional_noise_Hamiltonian=[[util.tensor(X, X),
                                                     np.ones(n_dt)]])
        with pytest.raises(ValueError, match='unique'):
            ff.extend([(p1, 0), (p1, 1)],
                      additional_noise_Hamiltonian=[
                          [util.tensor(X, X), np.ones(n_dt), 'foo'],
                          [util.tensor(X, X), np.ones(n_dt), 'foo']])
        with pytest.raises(ValueError, match='duplicate'):
            ff.extend([(p1, 1)],
                      additional_noise_Hamiltonian=[
                          [util.tensor(X, X), np.ones(n_dt),
                           str(p1.n_oper_identifiers[0]) + '_1']])
        with pytest.raises(ValueError, match='dimensions'):
            ff.extend([(p1, 0), (p1, 1)],
                      additional_noise_Hamiltonian=[[util.tensor(X, X, X),
                                                     np.ones(n_dt)]])
        with pytest.warns(UserWarning):
            # non-Pauli basis cannot retain caches
            p_ggm2 = rand_pulse_sequence(2, n_dt, btype='GGM')
            p_ggm2.dt = p_ggm.dt
            p_ggm.cache_filter_function(omega)
            ff.extend([(p_ggm, 0), (p_ggm, 1)])

    def test_extend_single_pulse_identity_warns(self):
        p1 = rand_pulse_sequence(2, 3, btype='Pauli')
        with pytest.warns(UserWarning, match='same'):
            out = ff.extend([(p1, 0)], N=1)
        assert out is p1

    def test_qubit_clash(self):
        p = rand_pulse_sequence(2, 2, btype='Pauli')
        q = rand_pulse_sequence(2, 2, btype='Pauli')
        with pytest.raises(ValueError):
            ff.extend([(p, 0), (q, 0)])

    def test_additional_noise_id_clash(self):
        X, Z = sigma[1], sigma[3]
        p = ff.PulseSequence([[X, [1.0], 'X']], [[Z, [1.0], 'Z']], [1.0],
                             basis=ff.Basis.pauli(1))
        with pytest.raises(ValueError):
            ff.extend([(p, 0, {'X': 'X_0', 'Z': 'ZZ'})], N=2,
                      additional_noise_Hamiltonian=[
                          [np.kron(Z, Z), [1.0], 'ZZ']])


class TestPulseCorrelationSemantics:
    """Pulse-correlation control matrix / FF caching and consistency
    (cf. reference tests/test_core.py:808-996)."""

    def setup_method(self):
        X, Y, Z = sigma[1:]
        self.omega = np.linspace(-20, 20, 120)
        self.px = ff.PulseSequence([[X, [np.pi / 2]]],
                                   [[X, [1]], [Y, [1]], [Z, [1]]], [1])
        self.py = ff.PulseSequence([[Y, [np.pi / 4]]],
                                   [[X, [1]], [Y, [1]], [Z, [1]]], [1])

    def test_unequal_cached_omega_raises(self):
        self.px.cache_filter_function(self.omega)
        self.py.cache_filter_function(self.omega + 1)
        with pytest.raises(ValueError):
            ff.concatenate([self.px, self.py],
                           calc_pulse_correlation_FF=True)

    def test_pc_caching_and_consistency(self):
        from filter_functions_tpu import numeric, util
        omega = self.omega
        self.px.cache_filter_function(omega)
        self.py.cache_filter_function(omega)
        p1 = self.px @ self.py
        p2 = ff.concatenate([self.px, self.py],
                            calc_pulse_correlation_FF=True,
                            which='fidelity')
        p3 = ff.concatenate([self.px, self.py],
                            calc_pulse_correlation_FF=True,
                            which='generalized')
        assert p2.is_cached('control_matrix_pc')
        assert p2.is_cached('filter_function_pc')
        assert p3.is_cached('control_matrix_pc')
        assert p3.is_cached('filter_function_pc_gen')
        assert p1 == p2

        f_pc = to_np(p2.get_pulse_correlation_filter_function())
        assert f_pc.shape == (2, 2, 3, 3, len(omega))
        # diagonal blocks real
        d1, d2 = np.eye(2, dtype=bool), np.eye(3, dtype=bool)
        assert np.abs(f_pc[d1][:, d2].imag).max() < 1e-14
        # sums to the total
        assert_allclose(f_pc.sum((0, 1)),
                        to_np(p1.get_filter_function(omega)), atol=1e-12)

        # wrong-dimension control matrix
        with pytest.raises(ValueError):
            numeric.calculate_pulse_correlation_filter_function(
                p1.get_control_matrix(omega))
        # not computed during concatenation
        with pytest.raises(util.CalculationError):
            p1.get_pulse_correlation_control_matrix()
        with pytest.raises(util.CalculationError):
            ff.infidelity(p1, np.ones_like(omega), omega,
                          which='correlations')
        with pytest.raises(ValueError):
            ff.infidelity(p1, np.ones_like(omega), omega, which='foobar')

        # FF derivable from the pc control matrix
        cm_pc = p3.get_pulse_correlation_control_matrix()
        for which in ('fidelity', 'generalized'):
            assert_allclose(
                to_np(p3.get_pulse_correlation_filter_function(which)),
                to_np(numeric.calculate_pulse_correlation_filter_function(
                    cm_pc, which)), atol=1e-14)

        # seeding a fresh pulse with the pc control matrix
        p4 = ff.concatenate([self.px, self.py])
        p4.cleanup('all')
        p4.cache_filter_function(omega, control_matrix=cm_pc,
                                 which='generalized')
        for alias in ('pulse correlation control matrix',
                      'generalized pulse correlation filter function',
                      'pulse correlation filter function',
                      'generalized filter function', 'filter function'):
            assert p4.is_cached(alias), alias
        assert_allclose(to_np(p4.get_filter_function(omega)),
                        to_np(p3.get_filter_function(omega)), atol=1e-13)

        # dropped pc FF is recovered from the cached pc control matrix
        p3._frequency_data.pop('filter_function_pc', None)
        assert_allclose(
            to_np(p3.get_pulse_correlation_filter_function('fidelity')),
            f_pc, atol=1e-13)

    def test_correlation_infidelities_decompose(self):
        omega = self.omega
        spectrum = 1e-2 * omega**0
        self.px.cache_filter_function(omega)
        self.py.cache_filter_function(omega)
        p1 = self.px @ self.py
        p2 = ff.concatenate([self.px, self.py],
                            calc_pulse_correlation_FF=True)
        ids = ['B_0', 'B_2']
        i_x = np.asarray(ff.infidelity(self.px, spectrum, omega,
                                       n_oper_identifiers=ids))
        i_y = np.asarray(ff.infidelity(self.py, spectrum, omega,
                                       n_oper_identifiers=ids))
        i_tot = np.asarray(ff.infidelity(p1, spectrum, omega,
                                         n_oper_identifiers=ids))
        i_corr = np.asarray(ff.infidelity(p2, spectrum, omega,
                                          which='correlations',
                                          n_oper_identifiers=ids))
        assert_allclose(i_corr.sum(), i_tot.sum(), rtol=1e-10)
        assert_allclose(i_corr[0, 0], i_x, rtol=1e-10)
        assert_allclose(i_corr[1, 1], i_y, rtol=1e-10)

        # correlated spectra
        cross = np.array([[1e-4 / omega**2, 1e-4 * np.exp(-omega**2)],
                          [1e-4 * np.exp(-omega**2), 1e-4 / omega**2]])
        i_tot = np.asarray(ff.infidelity(p1, cross, omega,
                                         n_oper_identifiers=ids))
        i_corr = np.asarray(ff.infidelity(p2, cross, omega,
                                          which='correlations',
                                          n_oper_identifiers=ids))
        assert_allclose(i_corr.sum(axis=(0, 1)), i_tot, rtol=1e-10)


class TestGeneralizedPulseCorrelation:
    def test_generalized_pc_traces_to_fidelity(self):
        omega = np.linspace(0.5, 5, 11)
        pulses = [rand_pulse_sequence(2, 3) for _ in range(2)]
        base = pulses[0]
        pulses = []
        for _ in range(2):
            arr = rand_pulse_arrays(2, 3)
            arr = (arr[0], arr[1], arr[2], base.n_opers,
                   base.n_oper_identifiers, arr[5], arr[6])
            pulses.append(ff.PulseSequence.from_arrays(
                arr[0], arr[1], arr[2], arr[3], arr[4], arr[5], arr[6],
                basis=base.basis))
        for p in pulses:
            p.cache_filter_function(omega, which='generalized')
        c = ff.concatenate(pulses, calc_pulse_correlation_FF=True,
                           which='generalized', omega=omega)
        gen = to_np(c.get_pulse_correlation_filter_function('generalized'))
        fid = to_np(c.get_pulse_correlation_filter_function('fidelity'))
        assert_allclose(np.trace(gen, axis1=4, axis2=5), fid, atol=1e-13)


class TestIdentifierClashCorrectness:
    """Regression tests: identifier-clash renaming must keep cached
    control-matrix rows attached to the right operators (the reference
    has both of these as latent flaws)."""

    def test_rename_reorders_rows(self):
        """Renaming 'a' -> 'a_0'/'a_1' sorts after 'a0' ('0' < '_'),
        permuting row order vs the cached pulses."""
        omega = np.linspace(0.5, 5, 9)
        X, Y, Z = sigma[1], sigma[2], sigma[3]
        rng_l = np.random.default_rng(5)
        p0 = ff.PulseSequence(
            [[X, rng_l.standard_normal(2), 'c']],
            [[X, [1.0, 1.0], 'a'], [Y, [0.5, 0.5], 'a0']],
            [0.5, 0.6])
        p1 = ff.PulseSequence(
            [[X, rng_l.standard_normal(2), 'c']],
            [[Z, [1.0, 1.0], 'a'], [Y, [0.5, 0.5], 'a0']],
            [0.4, 0.7])
        p0.cache_filter_function(omega)
        p1.cache_filter_function(omega)
        got = to_np(ff.concatenate([p0, p1]).get_filter_function(omega))
        scratch = ff.concatenate_without_filter_function([p0, p1])
        want = to_np(scratch.get_filter_function(omega))
        assert_allclose(got, want, atol=1e-12)

    def test_three_pulse_shared_clash(self):
        """Pulses 0 and 1 share oper X named 'a'; pulse 2 names a
        different oper 'a'. All mappings must be updated, not just the
        first pulse's."""
        omega = np.linspace(0.5, 5, 9)
        X, Y, Z = sigma[1], sigma[2], sigma[3]
        rng_l = np.random.default_rng(6)
        pulses = []
        for nop in (X, X, Z):
            p = ff.PulseSequence(
                [[X, rng_l.standard_normal(2), 'c']],
                [[nop, [1.0, 1.0], 'a'], [Y, [0.5, 0.5], 'b']],
                [0.5, 0.5])
            p.cache_filter_function(omega)
            pulses.append(p)
        got = to_np(ff.concatenate(pulses).get_filter_function(omega))
        scratch = ff.concatenate_without_filter_function(pulses)
        want = to_np(scratch.get_filter_function(omega))
        assert_allclose(got, want, atol=1e-12)


class TestDeepReduction:
    def test_long_pulse_ozaki_path(self, monkeypatch):
        """G d^2 > 2^16 exercises the chunked Ozaki reduction."""
        monkeypatch.setenv('FF_TPU_CONTRACT', 'ozaki')
        rng_l = np.random.default_rng(7)
        X, Z = sigma[1], sigma[3]
        G = 16500   # K = 4 G = 66000 > 65536
        p = ff.PulseSequence([[X / 2, rng_l.standard_normal(G), 'X']],
                             [[Z / 2, np.ones(G), 'Z']],
                             np.full(G, 1.0 / G))
        omega = np.linspace(0.5, 5, 5)
        got = to_np(p.get_control_matrix(omega))
        monkeypatch.delenv('FF_TPU_CONTRACT')
        p2 = ff.PulseSequence([[X / 2, p.c_coeffs[0], 'X']],
                              [[Z / 2, np.ones(G), 'Z']], p.dt)
        import filter_functions_tpu.numeric as numeric_mod
        # clear the jit caches so the native mode is actually retraced
        numeric_mod._ctrlmat_scratch_cached.clear_cache()
        numeric_mod._ctrlmat_scratch_scan.clear_cache()
        want = to_np(p2.get_control_matrix(omega))
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 1e-8


class TestCompositionKwargs:
    """Keyword-path coverage for remap/extend flags mirroring the
    reference's behavior."""

    def test_remap_identifier_mapping(self):
        pulse = rand_pulse_sequence(4, 3, btype='Pauli')
        omega = np.linspace(0.5, 10, 9)
        pulse.cache_filter_function(omega)
        mapping = {old: f'{old}_sw' for old in
                   (*pulse.c_oper_identifiers, *pulse.n_oper_identifiers)}
        swapped = ff.remap(pulse, (1, 0), oper_identifier_mapping=mapping)
        assert all(i.endswith('_sw') for i in swapped.c_oper_identifiers)
        assert all(i.endswith('_sw') for i in swapped.n_oper_identifiers)
        assert swapped.is_cached('filter function')

    def test_extend_cache_flags(self):
        x, z = sigma[1], sigma[3]
        pulse = ff.PulseSequence([[x, [np.pi / 2], 'X']],
                                 [[z, [1.0], 'Z']], [1],
                                 basis=ff.Basis.pauli(1))
        omega = np.linspace(0.5, 10, 9)
        pulse.cache_filter_function(omega)
        # explicit opt-out: no filter function on the extended pulse
        ext = ff.extend([(pulse, 0), (pulse, 1)],
                        cache_filter_function=False)
        assert not ext.is_cached('filter function')
        # opt out of diagonalization caching too
        ext2 = ff.extend([(pulse, 0), (pulse, 1)],
                         cache_diagonalization=False,
                         cache_filter_function=False)
        assert not ext2.is_cached('eigvals')
        # forcing FF caching with explicit omega on uncached pulses
        fresh = ff.PulseSequence([[x, [np.pi / 2], 'X']],
                                 [[z, [1.0], 'Z']], [1],
                                 basis=ff.Basis.pauli(1))
        ext3 = ff.extend([(fresh, 0), (fresh, 1)],
                         cache_filter_function=True, omega=omega)
        assert ext3.is_cached('filter function')

    def test_extend_warns_on_dropped_higher_order_caches(self):
        """extend() only carries first-order quantities; cached
        second-order / pulse-correlation FFs must be flagged."""
        x, z = sigma[1], sigma[3]
        pulse = ff.PulseSequence([[x, [np.pi / 2], 'X']],
                                 [[z, [1.0], 'Z']], [1],
                                 basis=ff.Basis.pauli(1))
        omega = np.linspace(0.5, 10, 9)
        pulse.cache_filter_function(omega)
        pulse.get_filter_function(omega, order=2)
        with pytest.warns(UserWarning, match='second order filter function'):
            ext = ff.extend([(pulse, 0), (pulse, 1)])
        assert not ext.is_cached('second order filter function')
        # no higher-order caches -> no warning
        clean = ff.PulseSequence([[x, [np.pi / 2], 'X']],
                                 [[z, [1.0], 'Z']], [1],
                                 basis=ff.Basis.pauli(1))
        clean.cache_filter_function(omega)
        with warnings.catch_warnings():
            warnings.simplefilter('error')
            ff.extend([(clean, 0), (clean, 1)])

    def test_concatenate_periodic_check_invertible_kwarg(self):
        pulse = rand_pulse_sequence(2, 3)
        omega = np.linspace(0.5, 10, 9)
        pulse.cache_filter_function(omega)
        a = ff.concatenate_periodic(pulse, 5, check_invertible=True)
        b = ff.concatenate_periodic(pulse, 5, check_invertible=False)
        assert_allclose(to_np(a.get_filter_function(omega)),
                        to_np(b.get_filter_function(omega)), atol=1e-14)


@pytest.mark.skipif(not HAVE_REFERENCE, reason='needs golden data')
class TestX2Y2Golden:
    """The advanced_concatenation.ipynb pipeline on the optimized
    X2ID/Y2ID pi/2-pulse goldens (reference
    doc/source/examples/advanced_concatenation.ipynb cells 4-19):
    Hadamard = Y2 @ X2 @ X2 from cached per-pulse filter functions, a
    framework-external oracle for exactly the concatenation cache-reuse
    path."""

    def _build(self, mod):
        from testutil import x2y2_single_qubit
        return {gate: mod.PulseSequence(*x2y2_single_qubit(gate))
                for gate in ('X2ID', 'Y2ID')}

    def test_hadamard_concatenation_golden(self):
        import filter_functions as ref
        ours, theirs = self._build(ff), self._build(ref)
        tau = float(np.asarray(ours['X2ID'].tau))
        omega = np.linspace(0, 1e2 / tau, 201)
        for pulses in (ours, theirs):
            for p in pulses.values():
                p.cache_filter_function(omega)
        got = ff.concatenate(
            (ours['Y2ID'], ours['X2ID'], ours['X2ID']),
            calc_pulse_correlation_FF=True)
        want = ref.concatenate(
            (theirs['Y2ID'], theirs['X2ID'], theirs['X2ID']),
            calc_pulse_correlation_FF=True)
        got_pc = to_np(got.get_pulse_correlation_filter_function())
        assert_allclose(got_pc,
                        want.get_pulse_correlation_filter_function(),
                        atol=1e-9)
        # correlations sum to the total FF, and the cache-reuse FF
        # equals the from-scratch FF of the composite pulse
        got_ff = to_np(got.get_filter_function(omega))
        assert_allclose(got_pc.sum(axis=(0, 1)), got_ff, atol=1e-12)
        fresh = ff.PulseSequence.from_arrays(
            got.c_opers, got.c_oper_identifiers, got.c_coeffs,
            got.n_opers, got.n_oper_identifiers, got.n_coeffs, got.dt,
            got.basis)
        assert_allclose(got_ff, to_np(fresh.get_filter_function(omega)),
                        atol=1e-9)

    def test_hadamard_second_order_golden(self):
        import filter_functions as ref
        ours, theirs = self._build(ff), self._build(ref)
        tau = float(np.asarray(ours['X2ID'].tau))
        omega = np.linspace(0, 1e2 / tau, 101)
        for pulses, mod in ((ours, ff), (theirs, ref)):
            for p in pulses.values():
                p.cache_filter_function(omega, cache_intermediates=True,
                                        order=1)
                p.cache_filter_function(omega, cache_intermediates=True,
                                        order=2)
        got = ff.concatenate(
            (ours['Y2ID'], ours['X2ID'], ours['X2ID']),
            calc_second_order_FF=True, which='generalized')
        want = ref.concatenate(
            (theirs['Y2ID'], theirs['X2ID'], theirs['X2ID']),
            calc_second_order_FF=True, which='generalized')
        for order in (1, 2):
            assert_allclose(
                to_np(got.get_filter_function(omega, order=order,
                                              which='generalized')),
                want.get_filter_function(omega, order=order,
                                         which='generalized'),
                atol=1e-9)


class TestScaleFastPaths:
    """The three ``len > 64`` fast paths added for long heterogeneous
    trains (VERDICT r4 item 2): the few-distinct Hamiltonian union,
    the distinct-gather stacking, and the G > 64 single-matmul atomic
    contraction.  Each test asserts the branch is actually ENTERED
    (via the module fast-path counters) and that its result is exactly
    (metadata) or numerically (device math) equal to the general path.
    Reference semantics anchor:
    /root/reference/filter_functions/pulse_sequence.py:1340-1483."""

    @staticmethod
    def _mixed_train(n_train=100, seed=11, infer_missing=True,
                     conflicting=False):
        """~n_train-position train drawn from 6 distinct cached-style
        pulses with MIXED segment counts (1/2/3, like Clifford trains)
        sharing control/noise operator ARRAYS (RB semantics).  Pulses
        2 and 5 lack noise operator 'b'; the others carry it at the
        constant 1.0 (inferable) or at conflicting constants."""
        rng_l = np.random.default_rng(seed)
        d = 2
        from testutil import rand_herm_traceless
        c_opers = rand_herm_traceless(d, 2, rng_l)
        n_opers = rand_herm_traceless(d, 2, rng_l)
        basis = ff.Basis.ggm(d)
        distinct = []
        for k, n_dt in enumerate([1, 2, 3, 2, 1, 3]):
            c_coeffs = rng_l.standard_normal((2, n_dt))
            if k in (2, 5):
                nops = [[n_opers[0], np.ones(n_dt), 'a']]
            else:
                b_val = (2.0 + k) if conflicting else 1.0
                nops = [[n_opers[0], np.ones(n_dt), 'a'],
                        [n_opers[1], np.full(n_dt, b_val), 'b']]
            distinct.append(ff.PulseSequence(
                [[c_opers[0], c_coeffs[0], 'X'],
                 [c_opers[1], c_coeffs[1], 'Y']],
                nops, 1 - rng_l.random(n_dt), basis))
        idx = rng_l.integers(0, len(distinct), size=n_train)
        # make sure the operator-lacking pulses are actually present
        idx[:2] = [2, 5]
        return [distinct[i] for i in idx], distinct

    def test_few_distinct_union_matches_general(self):
        import copy
        from filter_functions_tpu import sequencing

        train, _ = self._mixed_train()
        hits0 = sequencing._fastpath_hits['few_distinct']
        fast, cmap_f, nmap_f = ff.concatenate_without_filter_function(
            train, return_identifier_mappings=True)
        assert sequencing._fastpath_hits['few_distinct'] > hits0, \
            'few-distinct branch was not entered at G=100'

        # general path: per-position copies defeat the id() dedup
        gen, cmap_g, nmap_g = ff.concatenate_without_filter_function(
            [copy.deepcopy(p) for p in train],
            return_identifier_mappings=True)

        np.testing.assert_array_equal(fast.c_oper_identifiers,
                                      gen.c_oper_identifiers)
        np.testing.assert_array_equal(fast.n_oper_identifiers,
                                      gen.n_oper_identifiers)
        np.testing.assert_array_equal(np.asarray(fast.c_coeffs),
                                      np.asarray(gen.c_coeffs))
        # noise row 'b' was NaN at pulses 2/5's segments and must be
        # inferred to the constant 1.0 -- exactly like the general path
        np.testing.assert_array_equal(np.asarray(fast.n_coeffs),
                                      np.asarray(gen.n_coeffs))
        np.testing.assert_array_equal(np.asarray(fast.dt),
                                      np.asarray(gen.dt))
        assert to_np(fast.c_opers) == pytest.approx(to_np(gen.c_opers))
        assert to_np(fast.n_opers) == pytest.approx(to_np(gen.n_opers))
        assert dict(cmap_f) == dict(cmap_g)
        assert dict(nmap_f) == dict(nmap_g)
        b_row = list(fast.n_oper_identifiers).index('b')
        assert np.all(np.asarray(fast.n_coeffs)[b_row] == 1.0)

    def test_few_distinct_union_conflicting_sensitivities_raise(self):
        train, _ = self._mixed_train(conflicting=True)
        with pytest.raises(ValueError, match='cannot infer'):
            ff.concatenate_without_filter_function(train)

    def test_stack_gather_matches_naive(self):
        import jax.numpy as jnp
        from filter_functions_tpu import sequencing
        from filter_functions_tpu.cplx import asc

        rng_l = np.random.default_rng(5)
        base_r = [rng_l.standard_normal((3, 3)) for _ in range(8)]
        base_c = [rng_l.standard_normal((3, 3))
                  + 1j * rng_l.standard_normal((3, 3)) for _ in range(8)]
        idx = rng_l.integers(0, 8, size=100)
        items_r = [base_r[i] for i in idx]
        base_asc = [asc(b) for b in base_c]
        items_c = [base_asc[i] for i in idx]

        hits0 = sequencing._fastpath_hits['stack_real_gather']
        got_r = sequencing._stack_real(items_r)
        assert sequencing._fastpath_hits['stack_real_gather'] > hits0
        np.testing.assert_array_equal(
            np.asarray(got_r), np.asarray(jnp.stack(
                [jnp.asarray(x) for x in items_r])))

        hits0 = sequencing._fastpath_hits['stack_c_gather']
        got_c = sequencing._stack_c(items_c)
        assert sequencing._fastpath_hits['stack_c_gather'] > hits0
        want = np.stack([base_c[i] for i in idx])
        np.testing.assert_array_equal(to_np(got_c), want)

    def test_from_atomic_matmul_matches_einsum(self):
        from filter_functions_tpu import numeric
        from filter_functions_tpu.cplx import asc, ceinsum

        rng_l = np.random.default_rng(9)
        G, n_nops, d2, n_w = 80, 2, 4, 7

        def c_rand(*shape):
            return (rng_l.standard_normal(shape)
                    + 1j * rng_l.standard_normal(shape))

        phases = c_rand(G - 1, n_w)
        ctrl = c_rand(G, n_nops, d2, n_w)
        props = c_rand(G - 1, d2, d2)

        hits0 = numeric._fastpath_hits['from_atomic_matmul']
        got = numeric.calculate_control_matrix_from_atomic(
            asc(phases), asc(ctrl), asc(props))
        assert numeric._fastpath_hits['from_atomic_matmul'] > hits0, \
            'G > 64 matmul branch was not entered'
        want = asc(ctrl[0]) + ceinsum('go,gjko,gkl->jlo', asc(phases),
                                      asc(ctrl[1:]), asc(props))
        assert_allclose(to_np(got), to_np(want), rtol=1e-12, atol=1e-12)

    def test_full_concatenate_mixed_train_at_scale(self):
        """End-to-end: concatenate WITH cached filter functions over a
        100-position mixed train (drives the few-distinct union, the
        _stack_c/_stack_real gathers and the G > 64 atomic matmul in
        one flow) against a from-scratch evaluation of the merged
        pulse."""
        train, distinct = self._mixed_train()
        omega = np.linspace(0.1, 10, 21)
        for p in distinct:
            p.cache_filter_function(omega)
        fast = ff.concatenate(train)
        scratch = ff.concatenate_without_filter_function(train)
        scratch.cache_filter_function(omega)
        assert_allclose(to_np(fast.get_filter_function(omega)),
                        to_np(scratch.get_filter_function(omega)),
                        rtol=1e-9, atol=1e-9)

    def test_fused_train_matches_eager_path(self, monkeypatch):
        """The single-dispatch cached-train program (_concat_train_fused)
        must agree with the eager multi-op formulation on every cached
        byproduct: control matrix, filter function, total propagator,
        its Liouville representation, and the total phases (reference
        semantics: pulse_sequence.py:1668-1887)."""
        from math import pi
        from filter_functions_tpu import sequencing

        rng_l = np.random.default_rng(23)
        X, Y, Z = ff.util.paulis[1:]
        omega = np.geomspace(0.1, 10, 17)
        distinct = []
        for n_dt in (1, 2, 3, 2, 1, 3):
            c = pi * rng_l.standard_normal((2, n_dt))
            p = ff.PulseSequence(
                [[X / 2, c[0], 'X'], [Y / 2, c[1], 'Y']],
                [[Z / 2, np.ones(n_dt), 'Z']], 0.5 + rng_l.random(n_dt))
            p.cache_filter_function(omega)
            distinct.append(p)
        idx = rng_l.integers(0, len(distinct), size=90)
        train = [distinct[i] for i in idx]

        hits0 = sequencing._fastpath_hits['concat_train_fused']
        fused = ff.concatenate(train)
        assert sequencing._fastpath_hits['concat_train_fused'] == hits0 + 1

        monkeypatch.setattr(sequencing, '_ENABLE_TRAIN_FUSED', False)
        eager = ff.concatenate(train)
        assert sequencing._fastpath_hits['concat_train_fused'] == hits0 + 1

        assert_allclose(to_np(fused.get_control_matrix(omega)),
                        to_np(eager.get_control_matrix(omega)),
                        rtol=1e-10, atol=1e-10)
        assert_allclose(to_np(fused.get_filter_function(omega)),
                        to_np(eager.get_filter_function(omega)),
                        rtol=1e-10, atol=1e-10)
        assert_allclose(to_np(fused.total_propagator),
                        to_np(eager.total_propagator),
                        rtol=1e-12, atol=1e-12)
        assert_allclose(np.asarray(fused.total_propagator_liouville),
                        np.asarray(eager.total_propagator_liouville),
                        rtol=1e-12, atol=1e-12)
        assert_allclose(to_np(fused.get_total_phases(omega)),
                        to_np(eager.get_total_phases(omega)),
                        rtol=1e-12, atol=1e-12)
