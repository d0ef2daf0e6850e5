"""The tutorial notebook corpus (doc/notebooks, scripts/build_notebooks.py).

The reference ships its documentation as executed notebooks
(/root/reference/doc/source/examples/*.ipynb); these tests pin the
repo's analog: the builder authors valid notebooks for every corpus
entry, and the committed artifacts are executed (outputs present, no
error outputs, no machine-specific stderr spam).  Execution itself is
exercised by running ``scripts/build_notebooks.py``, not here -- a
full build takes minutes of CPU.
"""
import importlib.util
import json
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
NB_DIR = REPO / 'doc' / 'notebooks'

spec = importlib.util.spec_from_file_location(
    'build_notebooks', REPO / 'scripts' / 'build_notebooks.py')
builder = importlib.util.module_from_spec(spec)
spec.loader.exec_module(builder)

REFERENCE_COUNTERPARTS = [
    'getting_started', 'advanced_concatenation',
    'calculating_quantum_processes', 'extending_pulses',
    'periodic_driving', 'quantum_fourier_transform',
    'qutip_integration',
]


class TestBuilder:
    def test_corpus_covers_reference_notebooks(self):
        # every reference doc notebook has a same-named corpus entry
        missing = set(REFERENCE_COUNTERPARTS) - set(builder.NOTEBOOKS)
        assert not missing, missing

    @pytest.mark.parametrize('name', sorted(builder.NOTEBOOKS))
    def test_authors_valid_notebook(self, name):
        import nbformat
        nb = builder.build(name, builder.NOTEBOOKS[name])
        nbformat.validate(nb)
        kinds = [c.cell_type for c in nb.cells]
        assert kinds[0] == 'markdown'        # every tutorial opens with prose
        assert 'code' in kinds
        # the bootstrap cell pins the package path and the CPU backend
        first_code = next(c.source for c in nb.cells
                          if c.cell_type == 'code')
        assert 'filter_functions_tpu' in first_code
        assert "jax_platforms', 'cpu'" in first_code

    def test_scrub_drops_only_loader_spam(self):
        import nbformat
        nb = nbformat.v4.new_notebook()
        cell = nbformat.v4.new_code_cell('x')
        cell.outputs = [
            nbformat.v4.new_output('stream', name='stderr',
                                   text='cpu_aot_loader.cc:210] noise'),
            nbformat.v4.new_output('stream', name='stdout', text='keep'),
            nbformat.v4.new_output('stream', name='stderr',
                                   text='a real warning'),
        ]
        nb.cells = [cell]
        builder.scrub(nb)
        texts = [''.join(o['text']) for o in nb.cells[0].outputs]
        assert texts == ['keep', 'a real warning']


class TestCommittedArtifacts:
    @pytest.mark.parametrize('name', sorted(builder.NOTEBOOKS))
    def test_committed_notebook_is_executed_and_clean(self, name):
        path = NB_DIR / f'{name}.ipynb'
        assert path.exists(), f'{path} missing: run scripts/build_notebooks.py'
        nb = json.loads(path.read_text())
        outputs = [o for c in nb['cells'] for o in c.get('outputs', [])]
        assert outputs, 'committed notebook must carry executed outputs'
        assert not [o for o in outputs if o['output_type'] == 'error']
        spam = [o for o in outputs
                if o.get('output_type') == 'stream'
                and o.get('name') == 'stderr'
                and 'cpu_aot_loader' in ''.join(o.get('text', ''))]
        assert not spam, 'machine-specific loader spam leaked into outputs'

    def test_readme_indexes_every_notebook(self):
        readme = (NB_DIR / 'README.md').read_text()
        for name in builder.NOTEBOOKS:
            assert f'{name}.ipynb' in readme, name
