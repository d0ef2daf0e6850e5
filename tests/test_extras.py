"""Optional-dependency degradation (cf. reference tests/test_extras.py):
the core package must import and work without matplotlib/qutip/optax."""
import subprocess
import sys

import pytest


def _run_without(modules, code):
    """Run *code* in a subprocess where importing *modules* fails."""
    preamble = (
        "import sys\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "class _Block:\n"
        "    def __init__(self, names): self.names = names\n"
        "    def find_spec(self, name, path=None, target=None):\n"
        "        if name.split('.')[0] in self.names:\n"
        "            raise ImportError(f'{name} blocked for test')\n"
        "        return None\n"
        f"sys.meta_path.insert(0, _Block({modules!r}))\n"
        f"sys.path.insert(0, {str(sys.path[-1])!r})\n"
    )
    return subprocess.run([sys.executable, '-c', preamble + code],
                          capture_output=True, text=True, timeout=300)


@pytest.mark.parametrize('blocked', [['matplotlib', 'cycler'],
                                     ['qutip'],
                                     ['matplotlib', 'cycler', 'qutip',
                                      'optax']])
def test_core_works_without_extras(blocked):
    import pathlib
    repo = str(pathlib.Path(__file__).parent.parent)
    code = (
        f"import sys; sys.path.insert(0, {repo!r})\n"
        "import numpy as np\n"
        "import filter_functions_tpu as ff\n"
        "from math import pi\n"
        "I, X, Y, Z = ff.util.paulis\n"
        "p = ff.PulseSequence([[X/2, [0, pi], 'X'], [Y/2, [pi/2, 0], 'Y']],\n"
        "                     [[Z/2, [1, 1], 'Z']], [1, 1])\n"
        "omega = ff.util.get_sample_frequencies(p, n_samples=50)\n"
        "i = np.asarray(ff.infidelity(p, 1e-2/np.asarray(omega), omega))\n"
        "assert np.isfinite(i).all()\n"
        "print('OK')\n"
    )
    res = _run_without(blocked, code)
    assert res.returncode == 0, res.stderr
    assert 'OK' in res.stdout


def test_plotting_requires_matplotlib():
    import pathlib
    repo = str(pathlib.Path(__file__).parent.parent)
    code = (
        f"import sys; sys.path.insert(0, {repo!r})\n"
        "try:\n"
        "    from filter_functions_tpu import plotting\n"
        "except ImportError as err:\n"
        "    assert 'matplotlib' in str(err)\n"
        "    print('OK')\n"
        "else:\n"
        "    raise SystemExit('plotting imported without matplotlib')\n"
    )
    res = _run_without(['matplotlib', 'cycler'], code)
    assert res.returncode == 0, res.stderr
    assert 'OK' in res.stdout
