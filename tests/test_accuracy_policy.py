"""Randomized parity ensemble + escalation guard for the
depth-adaptive Ozaki accuracy policy.

The deep-truncation defaults (numeric._ctrlmat_contract: f32 P
assembly, 23-bit fixed-point factored D, reduced truncation for
1024 < K <= 16384) were tuned on the flagship QFT + 1/f bench; this
suite

1. sweeps seeded random pulses x spectra x dimensions through the
   SAME policy decisions the TPU takes (FF_TPU_CONTRACT=ozaki runs the
   identical int8-digit/int32-accumulator decomposition on any
   backend) and pins the worst-case infidelity parity
   distribution-wide, and
2. pins the automatic full-precision escalation
   (config.ozaki_escalation_tol / numeric._deep_quant_ratio) on a
   deliberately pathological refocusing train whose filter function
   cancels by 11 orders of magnitude,

so a future "free" optimization cannot silently breach the north-star
contract on an unlucky input.

Criterion for (1): the north star is absolute infidelity parity
<= 1e-10 at the flagship's per-noise-operator infidelity scale
(~2e-4, measured: bench parity 7.88e-11 ~ 4e-7 RELATIVE).  Infidelity
is LINEAR in the spectrum, so the scale-free equivalent is relative
parity <= 5e-7; asserted here at HALF that (2.5e-7) for every
(d, seed, spectrum) combination, against the natively-f64 einsum path
(itself pinned against the reference at ~1e-13 by
tests/test_precision.py).  Measured worst case: 5.5e-8 relative
(d=8, 1/f spectrum) -- a 9x margin, documented in
doc/performance.md.
"""
import numpy as np
import pytest

import filter_functions_tpu as ff
from filter_functions_tpu import numeric

from testutil import rand_pulse_arrays, make_pulse, generate_dd_hamiltonian

# (d, G) chosen so the reduction depth K = G d^2 = 2048 lands in the
# DEEP policy window 1024 < K <= 16384 (numeric.py: deep = slice width
# 5-6 bits <=> 2^10 < K <= 2^14)
SHAPES = [(4, 128), (8, 32), (16, 8)]
N_SEEDS = 5
N_OMEGA = 200

# relative-parity ceiling: HALF of the 1e-10-absolute-at-flagship-
# scale equivalent (5e-7); measured worst case 5.5e-8
REL_TOL = 2.5e-7


def _clear_ctrlmat_caches():
    numeric._ctrlmat_scratch_cached.clear_cache()
    numeric._ctrlmat_scratch_scan.clear_cache()


def _spectra(omega):
    return {
        'white': np.full_like(omega, 1e-4),
        'one_over_f': 1e-4 / omega,
        'lorentzian': 1e-3 / (1 + omega**2),
    }


def _infidelities(pulse, omega, spectra):
    return {name: float(np.asarray(ff.infidelity(pulse, s, omega)).sum())
            for name, s in spectra.items()}


@pytest.mark.slow
def test_deep_policy_parity_ensemble(monkeypatch):
    omega = np.geomspace(1e-2, 1e2, N_OMEGA)
    spectra = _spectra(omega)

    arrays = {}
    for d, G in SHAPES:
        for seed in range(N_SEEDS):
            rng = np.random.default_rng(1000 * d + seed)
            arrays[d, seed] = rand_pulse_arrays(d, G, n_cops=2, n_nops=2,
                                                local_rng=rng)

    # Pass 1: the TPU production path (Ozaki int8 digits, deep policy,
    # escalation at its default threshold -- which must NOT fire here)
    monkeypatch.setenv('FF_TPU_CONTRACT', 'ozaki')
    _clear_ctrlmat_caches()
    got = {}
    for (d, seed), arr in arrays.items():
        pulse = make_pulse(arr)
        got[d, seed] = _infidelities(pulse, omega, spectra)

    # Pass 2: native f64 einsum oracle
    monkeypatch.setenv('FF_TPU_CONTRACT', 'native')
    _clear_ctrlmat_caches()
    worst = (0.0, None)
    for (d, seed), arr in arrays.items():
        pulse = make_pulse(arr)
        want = _infidelities(pulse, omega, spectra)
        for name in spectra:
            rel = abs(got[d, seed][name] - want[name]) / abs(want[name])
            if rel > worst[0]:
                worst = (rel, (d, seed, name))
            assert rel <= REL_TOL, (
                f'deep-policy parity breach at d={d}, seed={seed}, '
                f'spectrum={name}: relative {rel:.2e} > {REL_TOL:.0e} '
                f'(= half of 1e-10 absolute at flagship infidelity '
                f'scale)')
    _clear_ctrlmat_caches()
    print(f'worst-case relative parity {worst[0]:.2e} at {worst[1]} '
          f'(ceiling {REL_TOL:.0e})')


@pytest.mark.slow
def test_escalation_on_cancellation_pathology(monkeypatch):
    """A deep (K = 2404) CPMG-300 train refocuses its dephasing FF by
    ~11 orders of magnitude at small omega; the factored fast path's
    operand quantization leaves ~1e-3 relative error there.  The
    in-graph estimator must fire (it reads 5.7 vs threshold 0.1) and
    the escaped full-precision branch must restore elementwise parity
    to the f64 floor of that dynamic range."""
    H, dt = generate_dd_hamiltonian(300, tau=10, tau_pi=1e-2,
                                    dd_type='cpmg')
    G = len(dt)
    Z = np.array([[1, 0], [0, -1]], complex)
    omega = np.geomspace(1e-4, 1e2, 100)

    def build_ff():
        _clear_ctrlmat_caches()
        pulse = ff.PulseSequence(H, [[Z / 2, np.ones(G), 'Z']], dt)
        return np.asarray(pulse.get_filter_function(omega).to_numpy())

    monkeypatch.setenv('FF_TPU_CONTRACT', 'ozaki')
    f_default = build_ff()                      # escalation on (default)
    monkeypatch.setenv('FF_TPU_OZAKI_ESCALATE_TOL', '1e30')
    f_fast = build_ff()                         # escalation disabled
    monkeypatch.delenv('FF_TPU_OZAKI_ESCALATE_TOL')
    monkeypatch.setenv('FF_TPU_CONTRACT', 'native')
    f_native = build_ff()
    _clear_ctrlmat_caches()

    floor = np.abs(f_native).max() * 1e-30
    rel_default = (np.abs(f_default - f_native)
                   / np.maximum(np.abs(f_native), floor)).max()
    rel_fast = (np.abs(f_fast - f_native)
                / np.maximum(np.abs(f_native), floor)).max()
    # the unescalated path is demonstrably broken elementwise ...
    assert rel_fast > 3e-4, f'pathology no longer pathological: {rel_fast:.2e}'
    # ... and the default (escalated) path fixes it
    assert rel_default < 1e-4, (
        f'escalation failed to fire or to restore parity: '
        f'{rel_default:.2e} (fast path: {rel_fast:.2e})')
