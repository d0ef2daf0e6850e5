"""Smoke tests for the plotting module on the Agg backend
(cf. reference tests/test_plotting.py)."""
import matplotlib
matplotlib.use('Agg')

import numpy as np
import pytest

import filter_functions_tpu as ff
from filter_functions_tpu import plotting
from testutil import make_pulse, rand_pulse_arrays, rand_pulse_sequence


@pytest.fixture(autouse=True)
def close_figures():
    yield
    import matplotlib.pyplot as plt
    plt.close('all')


def test_plot_pulse_train():
    pulse = rand_pulse_sequence(2, 5)
    fig, axes, legend = plotting.plot_pulse_train(pulse)
    assert len(axes.lines) >= 3


def test_plot_filter_function():
    pulse = rand_pulse_sequence(2, 4)
    fig, axes, legend = plotting.plot_filter_function(pulse)
    assert len(axes.lines) == 3
    # explicit omega + kwargs
    omega = np.linspace(0.5, 10, 20)
    fig, axes, legend = plotting.plot_filter_function(
        pulse, omega, xscale='linear', yscale='log',
        omega_in_units_of_tau=False)


def test_plot_pulse_correlation_filter_function():
    omega = np.linspace(0.5, 10, 11)
    base = rand_pulse_arrays(2, 3)
    pulses = []
    for _ in range(2):
        arr = rand_pulse_arrays(2, 3)
        pulses.append(make_pulse((arr[0], arr[1], arr[2], base[3], base[4],
                                  arr[5], arr[6])))
    for p in pulses:
        p.cache_filter_function(omega)
    combined = ff.concatenate(pulses, calc_pulse_correlation_FF=True)
    fig, axes, legend = \
        plotting.plot_pulse_correlation_filter_function(combined)
    assert axes.shape == (2, 2)


def test_plot_cumulant_function():
    pulse = rand_pulse_sequence(2, 3)
    omega = np.linspace(0.5, 10, 21)
    fig, grid = plotting.plot_cumulant_function(pulse, 1e-2 / omega, omega)
    assert len(grid) == 3
    fig, grid = plotting.plot_cumulant_function(pulse, 1e-2 / omega, omega,
                                                colorscale='log')


def test_plot_infidelity_convergence():
    pulse = rand_pulse_sequence(2, 3)
    n, infids = ff.infidelity(pulse, lambda w: 1e-2 / w,
                              dict(n_min=50, n_max=100, n_points=3),
                              test_convergence=True)
    fig, axes = plotting.plot_infidelity_convergence(n, infids)
    assert len(axes) == 2


def test_bloch_requires_qutip():
    pulse = rand_pulse_sequence(2, 3)
    if not plotting._HAS_QUTIP:
        with pytest.raises(RuntimeError):
            plotting.plot_bloch_vector_evolution(pulse)


def test_get_states_from_prop_and_bloch_vector():
    # |0> under X rotations: vector stays unit length, starts at +Z
    theta = np.linspace(0, np.pi, 7)
    X = np.array([[0, 1], [1, 0]], complex)
    U = np.stack([np.cos(t / 2) * np.eye(2) - 1j * np.sin(t / 2) * X
                  for t in theta])
    states = plotting.get_states_from_prop(U)
    assert states.shape == (7, 2, 1)
    vec = plotting.get_bloch_vector(states)
    assert vec.shape == (3, 7)
    np.testing.assert_allclose(np.linalg.norm(vec, axis=0), 1, atol=1e-12)
    np.testing.assert_allclose(vec[:, 0], [0, 0, 1], atol=1e-12)
    np.testing.assert_allclose(vec[:, -1], [0, 0, -1], atol=1e-12)
    with pytest.raises(ValueError):
        plotting.get_states_from_prop(U, np.ones((3, 1)))
