"""QuTiP integration: Qobj operators at the package boundary.

Counterpart of the reference's qutip-integration example
(/root/reference/doc/source/examples/qutip_integration.ipynb), which
feeds QuTiP ``Qobj`` control Hamiltonians from a GRAPE optimization
straight into ``PulseSequence``.  The boundary is duck-typed
(util.parse_operators: anything with ``.full()`` / ``.to_array()`` /
``.todense()`` is accepted), so Qobj, scipy sparse matrices, and plain
ndarrays can be mixed freely -- no explicit conversion step.

qutip itself is not required: when it is missing this example uses the
minimal stub from ``tests/_qutip_stub.py`` whose ``Qobj`` exposes the
same ``.full()`` interface the real class does.  The physics below
mirrors the reference notebook's setting (two-qubit IQ toy model with
local X/Y drives and a ZZ exchange coupling) with a hand-rolled smooth
pulse in place of the qutip GRAPE optimizer output.

Run:  python examples/qutip_integration.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tests'))

import filter_functions_tpu as ff  # noqa: E402

try:
    import qutip as qt

    def make_qobj(arr):
        return qt.Qobj(arr)
except ImportError:
    import _qutip_stub as qt  # the tests' minimal stand-in

    def make_qobj(arr):
        return qt.Qobj(arr)

# Two-qubit operators built as tensor products, wrapped in Qobj to
# exercise the duck-typed boundary (with real qutip these would be
# qt.tensor(qt.sigmax(), qt.qeye(2)) etc.).
I2, X, Y, Z = [np.asarray(p) for p in ff.util.paulis]
H_c_qobj = [
    make_qobj(np.kron(X, I2)),      # XI
    make_qobj(np.kron(Y, I2)),      # YI
    make_qobj(np.kron(I2, X)),      # IX
    make_qobj(np.kron(I2, Y)),      # IY
    make_qobj(np.kron(Z, Z)),       # ZZ exchange
]
identifiers = ['XI', 'YI', 'IX', 'IY', 'ZZ']

# A smooth 50-segment amplitude profile standing in for the GRAPE
# optimizer's final_amps (the reference notebook optimizes a QFT gate;
# any piecewise-constant amplitude array works identically here).
n_ts, evo_time = 50, 1.0
t = np.linspace(0, evo_time, n_ts, endpoint=False)
rng = np.random.default_rng(42)
amps = np.stack([np.sin(2 * np.pi * (k + 1) * t / evo_time + phi)
                 for k, phi in enumerate(rng.uniform(0, 2 * np.pi, 5))])

pulse = ff.PulseSequence(
    list(zip(H_c_qobj, amps, identifiers)),
    list(zip(H_c_qobj, np.ones((5, n_ts)), identifiers)),
    [evo_time / n_ts] * n_ts,
)
print(f'PulseSequence from Qobj operators: d = {pulse.d}, '
      f'{len(pulse)} segments')

omega = ff.util.get_sample_frequencies(pulse, spacing='log', n_samples=200)
F = np.asarray(pulse.get_filter_function(omega).to_numpy()).real
print('fidelity filter function diag at lowest frequency:')
for ident, f0 in zip(pulse.n_oper_identifiers, F[np.arange(5),
                                                 np.arange(5), 0]):
    print(f'  F_{ident}(w_min) = {f0:.4g}')

infid = np.asarray(ff.infidelity(pulse, 1e-3 / omega, omega))
print('1/f infidelities per noise channel:', np.round(infid, 8))

# Qobj states work at the plotting boundary too (get_states_from_prop
# accepts a Qobj psi0 via the same .full() duck typing).
try:
    import matplotlib
    matplotlib.use('Agg')
    from filter_functions_tpu import plotting
    fig, axes, _ = plotting.plot_filter_function(pulse, omega)
    out = os.path.join(os.path.dirname(__file__),
                       'qutip_integration_ff.png')
    fig.savefig(out)
    print('saved', out)
except ImportError:
    print('matplotlib missing; skipped the plot')
