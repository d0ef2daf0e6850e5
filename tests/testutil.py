"""Shared test utilities: seeded random pulse factories that build the
*same* physical pulse in both this package and the reference (when
available), plus dynamical-decoupling Hamiltonian generators and the
CNOT golden data from /root/reference/examples/data/CNOT.mat.
"""
from pathlib import Path

import numpy as np

import filter_functions_tpu as ff
from conftest import HAVE_REFERENCE, REFERENCE_PATH

rng = np.random.default_rng(seed=42)

sigma = np.array([
    [[1, 0], [0, 1]],
    [[0, 1], [1, 0]],
    [[0, -1j], [1j, 0]],
    [[1, 0], [0, -1]],
], dtype=complex)


def rand_herm(d, n=1, local_rng=None):
    r = local_rng or rng
    a = r.standard_normal((n, d, d)) + 1j * r.standard_normal((n, d, d))
    return (a + a.conj().transpose(0, 2, 1)) / 2


def rand_herm_traceless(d, n=1, local_rng=None):
    a = rand_herm(d, n, local_rng)
    a -= np.einsum('nii->n', a)[:, None, None] * np.eye(d) / d
    return a


def rand_unit(d, n=1, local_rng=None):
    h = rand_herm(d, n, local_rng)
    w, v = np.linalg.eigh(h)
    phases = np.exp(1j * w)
    return np.einsum('nij,nj,nkj->nik', v, phases, v.conj())


def rand_pulse_arrays(d, n_dt, n_cops=3, n_nops=3, local_rng=None,
                      commensurable_timesteps=False):
    """Random pulse ingredient arrays (host numpy)."""
    r = local_rng or rng
    letters = np.array(list('abcdefghijklmnopqrstuvwxyz'
                            'ABCDEFGHIJKLMNOPQRSTUVWXYZ'))
    c_opers = rand_herm_traceless(d, n_cops, r)
    n_opers = rand_herm_traceless(d, n_nops, r)
    c_coeffs = r.standard_normal((n_cops, n_dt))
    n_coeffs = r.random((n_nops, n_dt))
    c_ids = r.choice(letters, n_cops, replace=False)
    n_ids = r.choice(letters, n_nops, replace=False)
    if commensurable_timesteps:
        dt = np.full(n_dt, 1 - r.random())
    else:
        dt = 1 - r.random(n_dt)
    return c_opers, c_ids, c_coeffs, n_opers, n_ids, n_coeffs, dt


def make_pulse(arrays, btype='GGM', cls=None):
    """Build a PulseSequence (ours by default) from rand_pulse_arrays."""
    c_opers, c_ids, c_coeffs, n_opers, n_ids, n_coeffs, dt = arrays
    d = c_opers.shape[-1]
    mod = cls or ff
    if btype == 'GGM':
        basis = mod.Basis.ggm(d)
    else:
        basis = mod.Basis.pauli(int(np.log2(d)))
    return mod.PulseSequence(
        list(zip(c_opers, c_coeffs, c_ids)),
        list(zip(n_opers, n_coeffs, n_ids)),
        dt, basis)


def rand_pulse_sequence(d, n_dt, n_cops=3, n_nops=3, btype='GGM',
                        local_rng=None):
    return make_pulse(rand_pulse_arrays(d, n_dt, n_cops, n_nops, local_rng),
                      btype=btype)


def pulse_pair(d, n_dt, n_cops=3, n_nops=3, btype='GGM', local_rng=None):
    """The same random pulse in (ours, reference); reference None if
    unavailable."""
    arrays = rand_pulse_arrays(d, n_dt, n_cops, n_nops, local_rng)
    ours = make_pulse(arrays, btype=btype)
    theirs = None
    if HAVE_REFERENCE:
        import filter_functions as ref
        theirs = make_pulse(arrays, btype=btype, cls=ref)
    return ours, theirs


def generate_dd_hamiltonian(n, tau=10, tau_pi=1e-2, dd_type='cpmg',
                            pulse_type='primitive'):
    """Piecewise-constant X-pulse trains for CPMG/UDD/PDD/CDD sequences
    (mirrors the construction in the reference's test utilities)."""
    def cdd_odd(g, t):
        return np.array([*cdd_even(g - 1, t / 2), t / 2,
                         *cdd_even(g - 1, t / 2) + t / 2])

    def cdd_even(g, t):
        if g == 0:
            return np.array([])
        return np.array([*cdd_odd(g - 1, t / 2),
                         *cdd_odd(g - 1, t / 2) + t / 2])

    if dd_type == 'cpmg':
        delta = np.array([0] + [(g - 0.5) / n for g in range(1, n + 1)])
    elif dd_type == 'udd':
        delta = np.array([0] + [np.sin(np.pi * g / (2 * n + 2))**2
                                for g in range(1, n + 1)])
    elif dd_type == 'pdd':
        delta = np.array([0] + [g / (n + 1) for g in range(1, n + 1)])
    elif dd_type == 'cdd':
        delta = cdd_odd(n, 1) if n % 2 else cdd_even(n, 1)
        delta = np.insert(delta, 0, 0)

    if pulse_type == 'primitive':
        tau_p = tau_pi
        s_p = np.pi / tau_pi * np.array([0, 1])
        t_p = tau_pi * np.array([0, 1])
    else:  # dcg
        tau_p = 4 * tau_pi
        s_p = np.pi / tau_pi * np.array([0, 1, 0.5, 1])
        t_p = np.array([0, tau_pi, 2 * tau_pi, tau_pi]).cumsum()

    s = np.array([])
    t = np.array([0])
    for i in range(len(delta) - 1):
        s = np.append(s, s_p)
        t = np.append(t, t_p + (delta * tau)[i + 1] - tau_p / 2)
    t = np.append(t, tau)
    s = np.append(s, 0)
    return [[sigma[1] / 2, s]], np.diff(t)


# -- Golden gate data (loaded lazily; requires scipy + reference tree) --------
# CNOT.mat / X2ID.mat / Y2ID.mat share one MATLAB export format: an
# exchange-coupled 4-spin pulse (eps (3, n_dt), t (n_dt,), B (3,)) with
# Monte-Carlo golden infidelities infid_fast (one per spectrum exponent
# alpha in {0, 0.7}).  The single-qubit gates X2ID/Y2ID act as sqrt(X)/
# sqrt(Y) x Id on the two encoded qubits.
_gate_cache = {}


def gate_data(name='CNOT'):
    """An optimized exchange-pulse golden (CNOT, X2ID or Y2ID) reduced
    to its 6-level zero-spin subspace, with MATLAB golden infidelities
    (infid_fast)."""
    if name in _gate_cache:
        return _gate_cache[name]
    from scipy import io
    struct = io.loadmat(str(REFERENCE_PATH / f'examples/data/{name}.mat'))
    eps = np.asarray(struct['eps'], order='C')
    dt = np.asarray(struct['t'].ravel(), order='C')
    b_field = np.asarray(struct['B'].ravel(), order='C')
    infid_fast = struct['infid_fast'].ravel()
    j_exch = np.exp(eps)
    n_dt = len(dt)

    def kron4(*ops):
        out = np.ones((1, 1), complex)
        for op in ops:
            out = np.kron(out, op)
        return out

    Id, Px, Py, Pz = sigma
    H = np.empty((6, 16, 16))
    H[0] = sum(kron4(P, P, Id, Id) for P in (Px, Py, Pz)).real / 4
    H[1] = sum(kron4(Id, P, P, Id) for P in (Px, Py, Pz)).real / 4
    H[2] = sum(kron4(Id, Id, P, P) for P in (Px, Py, Pz)).real / 4
    H[3] = (kron4(Pz, Id, Id, Id) * (-3) + kron4(Id, Pz, Id, Id)
            + kron4(Id, Id, Pz, Id) + kron4(Id, Id, Id, Pz)).real / 8
    H[4] = (kron4(Pz, Id, Id, Id) * (-1) + kron4(Id, Pz, Id, Id) * (-1)
            + kron4(Id, Id, Pz, Id) + kron4(Id, Id, Id, Pz)).real / 4
    H[5] = (kron4(Pz, Id, Id, Id) * (-1) + kron4(Id, Pz, Id, Id) * (-1)
            + kron4(Id, Id, Pz, Id) * (-1) + kron4(Id, Id, Id, Pz) * 3
            ).real / 8

    subspace = [3, 5, 6, 9, 10, 12]
    d_sub = 6
    opers = [h[np.ix_(subspace, subspace)] for h in H]
    opers = [op - np.trace(op) / d_sub * np.eye(d_sub) for op in opers]

    c_coeffs = [j_exch[0], j_exch[1], j_exch[2],
                b_field[0] * np.ones(n_dt), b_field[1] * np.ones(n_dt),
                b_field[2] * np.ones(n_dt)]
    n_coeffs = [j_exch[0], j_exch[1], j_exch[2],
                np.ones(n_dt), np.ones(n_dt), np.ones(n_dt)]

    # Dial et al. 1/f^alpha spectrum constants
    eps0 = 2.7241e-4
    alpha = np.array([0, 0.7])
    s0 = 4e-11 / eps0**2
    amp = s0 * (2 * np.pi * 1e-3)**alpha

    _gate_cache[name] = dict(opers=opers, c_coeffs=c_coeffs,
                             n_coeffs=n_coeffs, dt=dt,
                             infid_fast=infid_fast, alpha=alpha, amp=amp)
    return _gate_cache[name]


def cnot_data():
    return gate_data('CNOT')


def x2y2_single_qubit(name):
    """The X2ID/Y2ID goldens as the single-qubit (d = 2) pulses of the
    reference's advanced_concatenation.ipynb: H_c = [J_12(t) X/2,
    B_12 Z/2] with noise on the exchange only (sensitivity J_12)."""
    from scipy import io
    struct = io.loadmat(str(REFERENCE_PATH / f'examples/data/{name}.mat'))
    j_exch = np.exp(np.asarray(struct['eps'], order='C'))[0]
    dt = np.asarray(struct['t'].ravel(), order='C')
    b_field = np.asarray(struct['B'].ravel(), order='C')[0]
    _, X, _, Z = sigma
    H_c = [[X / 2, j_exch, 'J'], [Z / 2, b_field * np.ones(len(dt)), 'B']]
    H_n = [[X / 2, j_exch, 'J']]
    return H_c, H_n, dt


def assert_allclose(actual, desired, rtol=1e-7, atol=0, err_msg=''):
    np.testing.assert_allclose(np.asarray(actual), np.asarray(desired),
                               rtol=rtol, atol=atol, err_msg=err_msg)


def to_np(x):
    """Convert ours/theirs values (C, jnp, np) to numpy complex."""
    if hasattr(x, 'to_numpy'):
        return x.to_numpy()
    return np.asarray(x)
