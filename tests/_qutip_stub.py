"""Minimal qutip stand-in (pattern: tests/_sparse_stub.py).

qutip is not installed in this image; this stub exposes the tiny API
surface `plotting.py` touches (`Qobj.full`, `Bloch` with
fig/axes/view/labels and `make_sphere`) so the Bloch-sphere trajectory
path (`plot_bloch_vector_evolution`, `init_bloch_sphere`, the Qobj
branch of `get_bloch_vector`; reference behavior
/root/reference/filter_functions/plotting.py:155-270) actually
executes and its geometry can be asserted, instead of being covered
only by a requires-qutip negative test.
"""
import numpy as np


class Qobj:
    """Wraps a complex ndarray; `.full()` returns it (the only method
    the plotting boundary uses)."""

    def __init__(self, data):
        self._data = np.asarray(data, dtype=complex)

    def full(self):
        return self._data

    @property
    def shape(self):
        return self._data.shape


class Bloch:
    """Records the constructor/state interactions plotting performs on
    a qutip.Bloch; drawing the wireframe sphere itself is cosmetic and
    skipped."""

    def __init__(self, fig=None, axes=None, view=None, figsize=None,
                 **kwargs):
        self.fig = fig
        self.axes = axes
        self.view = view if view is not None else [-60, 30]
        self.xlabel = ['$x$', '']
        self.ylabel = ['$y$', '']
        self.zlabel = [r'$\left|0\right>$', r'$\left|1\right>$']
        self.sphere_drawn = False

    def make_sphere(self):
        self.sphere_drawn = True
