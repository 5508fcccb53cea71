"""Workflow orchestration: run.gpr / run.gsa (reference: romcomma/user/run.py).

Reproduces the reference's recursion and tri-state expansion exactly:
  - ``is_covariant=None`` runs variant then covariant; ``is_isotropic=None``
    runs isotropic then anisotropic (run.py:69-78).
  - ``is_read=None`` warm-starts each model from its nearest trained ancestor
    in the independence/isotropy hierarchy by copying the model folder
    (``<name>.v.i`` -> ``<name>.v.a`` -> ``<name>.c.a``, run.py:79-88) before
    broadcasting parameters up.
  - results are Collect-ed across folds with provenance columns.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from romcomma_tpu.base.classes import Data
from romcomma_tpu.data.storage import Repository, Fold
from romcomma_tpu.models.gpr import GPR, MOGP
from romcomma_tpu.gsa.models import GSA, Sobol
from romcomma_tpu.user import contexts, results


def gpr(name: str, repo: Repository, is_read: Optional[bool], is_covariant: Optional[bool],
        is_isotropic: Optional[bool], ignore_exceptions: bool = False,
        kernel_parameters: Optional[Dict] = None, likelihood_variance=None,
        is_calibrated: bool = True, is_tested: bool = True, **kwargs) -> List[str]:
    """Undertake GPR on a Fold, or recursively across the Folds in a Repository.
    Returns the list of model names constructed (reference run.py:35-102)."""
    if not isinstance(repo, Fold):
        names: List[str] = []
        for k in repo.folds:
            names = gpr(name, Fold(repo, k), is_read, is_covariant, is_isotropic,
                        ignore_exceptions, kernel_parameters, likelihood_variance,
                        is_calibrated, is_tested, **kwargs)
        if is_tested:
            results.Collect({'test': {'header': [0, 1]}, 'test_summary': {'header': [0, 1], 'index_col': 0}},
                            {n: {} for n in names}, ignore_exceptions).from_folds(repo, True)
        results.Collect({'variance': {}, 'log_marginal': {}},
                        {f'{n}/likelihood': {} for n in names}, ignore_exceptions).from_folds(repo, True)
        results.Collect({'variance': {}, 'lengthscales': {}},
                        {f'{n}/kernel': {} for n in names}, ignore_exceptions).from_folds(repo, True)
        return names
    if is_covariant is None:
        names = gpr(name, repo, is_read, False, is_isotropic, ignore_exceptions,
                    kernel_parameters, likelihood_variance, is_calibrated, is_tested, **kwargs)
        return (names +
                gpr(name, repo, None, True, False if is_isotropic is None else is_isotropic,
                    ignore_exceptions, kernel_parameters, likelihood_variance,
                    is_calibrated, is_tested, **kwargs))
    full_name = name + ('.c' if is_covariant else '.v')
    if is_isotropic is None:
        names = gpr(name, repo, is_read, is_covariant, True, ignore_exceptions,
                    kernel_parameters, likelihood_variance, is_calibrated, is_tested, **kwargs)
        return names + gpr(name, repo, None, is_covariant, False, ignore_exceptions,
                           kernel_parameters, likelihood_variance, is_calibrated, is_tested, **kwargs)
    full_name = full_name + ('.i' if is_isotropic else '.a')
    if is_read is None:
        if not (repo.folder / full_name).exists():
            nearest_name = name + '.v' + full_name[-2:]
            if not (is_covariant and (repo.folder / nearest_name).exists()):
                nearest_name = full_name[:-2] + '.i'
                if not (repo.folder / nearest_name).exists():
                    return gpr(name, repo, False, is_covariant, is_isotropic, ignore_exceptions,
                               kernel_parameters, likelihood_variance, is_calibrated, is_tested, **kwargs)
            Data.copy(src_folder=repo.folder / nearest_name, dst_folder=repo.folder / full_name)
        return gpr(name, repo, True, is_covariant, is_isotropic, ignore_exceptions,
                   kernel_parameters, likelihood_variance, is_calibrated, is_tested, **kwargs)
    with contexts.Timer(f'fold.{repo.meta["k"]} {full_name} GPR'):
        try:
            if is_read:
                gp = MOGP(full_name, repo, is_read, is_covariant, is_isotropic)
            else:
                gp = MOGP(full_name, repo, is_read, is_covariant, is_isotropic,
                          kernel_parameters, likelihood_variance)
            if is_calibrated:
                gp.calibrate(**kwargs)
            if is_tested:
                gp.test()
        except BaseException as exception:
            if not ignore_exceptions:
                raise exception
    return [full_name]


def rom(name: str, repo: Repository, m: int = 1, **kwargs) -> List[Dict[str, Any]]:
    """Undertake ROM (iterative input-basis rotation) across the Folds of a
    Repository. Thin orchestration wrapper over rom.rom.run_rom — the
    reference has no working equivalent (its ROM is dormant, rom/old.py)."""
    from romcomma_tpu.rom.rom import run_rom
    return run_rom(name, repo, m=m, **kwargs)


def gsa(name: str, repo: Repository, is_covariant: Optional[bool], is_isotropic: Optional[bool],
        kinds: 'GSA.Kind | Sequence[GSA.Kind]' = None, m: int = -1,
        ignore_exceptions: bool = False, is_error_calculated: bool = False, **kwargs) -> List[Path]:
    """Undertake GSA on a Fold, or recursively across the Folds in a Repository
    (reference run.py:105-158)."""
    kinds = GSA.ALL_KINDS if kinds is None else kinds
    kinds = (kinds,) if isinstance(kinds, GSA.Kind) else kinds
    if not isinstance(repo, Fold):
        names: List[Path] = []
        for k in repo.folds:
            names = gsa(name, Fold(repo, k), is_covariant, is_isotropic, kinds, m,
                        ignore_exceptions, is_error_calculated, **kwargs)
        results.Collect({'S': {}, 'V': {}} | ({'T': {}, 'W': {}} if is_error_calculated else {}),
                        {str(n): {} for n in names}, ignore_exceptions).from_folds(repo, True)
        for n in names:
            shutil.copyfile(repo.fold_folder(repo.folds.start) / 'meta.json',
                            repo.folder / n / 'meta.json')
        return names
    if is_covariant is None:
        names = gsa(name, repo, False, is_isotropic, kinds, m, ignore_exceptions,
                    is_error_calculated, **kwargs)
        return (names +
                gsa(name, repo, True, False if is_isotropic is None else is_isotropic,
                    kinds, m, ignore_exceptions, is_error_calculated, **kwargs))
    full_name = name + ('.c' if is_covariant else '.v')
    if is_isotropic is None:
        names = gsa(name, repo, is_covariant, True, kinds, m, ignore_exceptions,
                    is_error_calculated, **kwargs)
        return names + gsa(name, repo, is_covariant, False, kinds, m, ignore_exceptions,
                           is_error_calculated, **kwargs)
    full_name = full_name + ('.i' if is_isotropic else '.a')
    with contexts.Timer(f'fold.{repo.meta["k"]} {full_name} GSA'):
        names = []
        try:
            from romcomma_tpu.gsa.calibrators import marginalize_all_kinds
            gp = MOGP(full_name, repo, is_read=True, is_covariant=is_covariant,
                      is_isotropic=is_isotropic)
            sobols = [Sobol(gp, kind, m, is_error_calculated, **kwargs) for kind in kinds]
            # One jitted computation covers every kind (shared calibrator
            # precompute); each Sobol then post-processes and saves its share.
            kind_slices = {s.kind.name: tuple(s._m_dataset) for s in sobols}
            by_kind, extras = marginalize_all_kinds(gp, kind_slices,
                                                    is_error_calculated,
                                                    **sobols[0].meta)
            for s in sobols:
                folder = s.calibrate(precomputed=(by_kind[s.kind.name], extras)).get('folder')
                names += [Path(folder).relative_to(repo.folder)]
        except BaseException as exception:
            if not ignore_exceptions:
                raise exception
    return names
