"""One-shot generator for the committed reference golden tree.

Imports the READ-ONLY reference package's data layer
(/root/reference/romcomma/data/storage.py) under lightweight stubs for its
gpflow/tensorflow/SALib dependencies (none of which the data layer touches at
runtime), runs the deterministic workload from workload.py, and stores the
resulting CSV + meta.json tree under tests/golden/reference_tree/.

Run from the repo root:  python tests/golden/make_reference_golden.py
The tree is committed; tests/test_golden_tree.py byte-diffs this repo's
data layer against it on every test run."""

from __future__ import annotations

import sys
import types
import shutil
from pathlib import Path

import numpy as np

HERE = Path(__file__).parent
TREE = HERE / 'reference_tree'


def load_reference_storage():
    np.NaN = np.nan  # the numpy<2 alias the reference uses
    import pandas as pd
    take = pd.DataFrame.take
    # The reference targets pandas<1.1, whose take() accepted is_copy
    # (modern take always copies, so dropping the kwarg is behavior-neutral).
    pd.DataFrame.take = (lambda self, indices, axis=0, is_copy=None, **kw:
                         take(self, indices, axis=axis, **kw))

    class StubModule(types.ModuleType):
        """Attribute access mints an inheritable placeholder class."""

        def __getattr__(self, name):
            if name.startswith('__'):
                raise AttributeError(name)
            value = type(name, (), {'__init__': lambda self, *a, **k: None})
            setattr(self, name, value)
            return value

    tf = StubModule('tensorflow')
    tf.constant = lambda value, dtype=None: value
    gf = StubModule('gpflow')
    gf.config = types.SimpleNamespace(default_float=lambda: np.float64,
                                      default_int=lambda: np.int64)
    salib = StubModule('SALib')
    test_functions = StubModule('SALib.test_functions')
    salib.test_functions = test_functions
    sys.modules.update({'tensorflow': tf, 'gpflow': gf,
                        'romcomma.gpf': StubModule('romcomma.gpf'),
                        'SALib': salib, 'SALib.test_functions': test_functions})
    for name in ('Ishigami', 'Sobol_G', 'oakley2004'):
        module = StubModule(f'SALib.test_functions.{name}')
        module.evaluate = lambda *a, **k: None
        setattr(test_functions, name, module)
        sys.modules[f'SALib.test_functions.{name}'] = module

    sys.path.insert(0, '/root/reference')
    from romcomma.data import storage
    return storage


def reference_model_adapter(storage):
    """Adapter driving the reference's MODEL-layer writers (gpr/models.py,
    gsa/models.py) under the same stubs. Only the gpflow-touching
    construction hooks are overridden; every CSV/meta byte is produced by
    reference code."""
    tf = sys.modules['tensorflow']
    gf = sys.modules['gpflow']
    mf = sys.modules['romcomma.gpf']
    # the kernel/model factories touched during (never-calibrated)
    # construction: broadcast_parameters rebuilds .implementation
    gf.kernels = types.SimpleNamespace(RBF=lambda **kw: None)
    mf.kernels = types.SimpleNamespace(RBF=lambda **kw: None)
    gf.models = types.SimpleNamespace(GPR=lambda **kw: None)
    mf.models = types.SimpleNamespace(MOGPR=lambda **kw: None)
    # gsa/models.py:102-115 _compose_and_save reshapes TF tensors
    tf.reshape = lambda x, s: types.SimpleNamespace(
        numpy=lambda: np.asarray(getattr(x, 'a', x)).reshape(s))

    from romcomma.gpr import models as gpr_models
    from romcomma.gsa import models as gsa_models

    class GoldenMOGP(gpr_models.MOGP):
        """Reference MOGP with the gpflow build short-circuited: parameter
        persistence (the golden target) is untouched."""

        @property
        def implementation(self):
            return ()

    class FakeTensor:
        def __init__(self, a):
            self.a = np.asarray(a)
            self.shape = types.SimpleNamespace(as_list=lambda: list(self.a.shape))

    class Adapter:
        @staticmethod
        def open_fold(folder, k):
            return storage.Fold(storage.Repository(folder), k)

        @staticmethod
        def make_mogp(name, fold, is_covariant):
            return GoldenMOGP(name, fold, is_read=False,
                              is_covariant=is_covariant, is_isotropic=False)

        @staticmethod
        def write_sobol(gp, kind_name, m, results):
            sobol = gsa_models.Sobol(gp, gsa_models.GSA.Kind[kind_name], m=m,
                                     is_error_calculated=True,
                                     folder='<golden>')
            sobol._compose_and_save({k: FakeTensor(v)
                                     for k, v in results.items()})

    return Adapter


def main() -> None:
    sys.path.insert(0, str(HERE))
    import workload
    import workload_model

    storage = load_reference_storage()
    shutil.rmtree(TREE, ignore_errors=True)
    workload.run(storage, TREE)
    workload_model.run(reference_model_adapter(storage), TREE)
    files = sorted(p.relative_to(TREE) for p in TREE.rglob('*') if p.is_file())
    print(f'Wrote {len(files)} golden files under {TREE}:')
    for f in files:
        print(' ', f)


if __name__ == '__main__':
    main()
