"""Type aliases (parity with /root/reference/filter_functions/types.py).

The reference mocks qutip/matplotlib types when those extras are absent
(types.py:28-49); here the aliases are structural only.
"""
from typing import Sequence, Tuple, Union

import numpy as np

try:
    from qutip import Qobj
    _HAS_QUTIP = True
except ImportError:
    Qobj = type('Qobj', (), {})
    _HAS_QUTIP = False

#: A 1d array of (possibly time-dependent) coefficients.
Coefficients = Union[Sequence[float], np.ndarray]
#: A square operator: ndarray or qutip.Qobj.
Operator = Union[np.ndarray, Qobj]
#: A quantum state (vector or density matrix).
State = Union[np.ndarray, Qobj]
#: Nested-list Hamiltonian format: [[oper, coeffs, identifier?], ...].
Hamiltonian = Sequence[Sequence]
#: extend() mapping format: [(pulse, qubits, identifier_mapping?), ...].
PulseMapping = Sequence[Tuple]

# Matplotlib/cycler return-type aliases (reference types.py:28-64); mocked
# when the plotting extra is missing so annotations stay importable.
try:
    from matplotlib.axes import Axes
    from matplotlib.colors import Colormap
    from matplotlib.figure import Figure
    from matplotlib.legend import Legend
except ImportError:
    Axes = type('Axes', (), {})
    Colormap = type('Colormap', (), {})
    Figure = type('Figure', (), {})
    Legend = type('Legend', (), {})
try:
    from cycler import Cycler
except ImportError:
    Cycler = type('Cycler', (), {})

Grid = np.ndarray
FigureAxes = Tuple[Figure, Axes]
FigureAxesLegend = Tuple[Figure, Axes, Legend]
FigureGrid = Tuple[Figure, Grid]
