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
import warnings
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from romcomma_tpu.base.classes import Data
from romcomma_tpu.data.storage import Repository, Fold
from romcomma_tpu.models.gpr import GPR, MOGP
from romcomma_tpu.gsa.models import GSA, Sobol
from romcomma_tpu.user import contexts, results


def _model_passes(is_covariant: Optional[bool], is_isotropic: Optional[bool]) -> List[tuple]:
    """Expand the tri-state model-type flags (``None`` = run both settings)
    into the ordered ``(is_covariant, is_isotropic)`` pass list.

    In a full expansion (both flags ``None``) the variant chain runs
    isotropic then anisotropic, and the covariant pass runs anisotropic
    only — it warm-starts from the trained variant anisotropic model
    (reference run.py:69-78 semantics)."""
    passes = []
    for covariant in ([False, True] if is_covariant is None else [is_covariant]):
        if is_isotropic is not None:
            isotropies = [is_isotropic]
        elif covariant and is_covariant is None:
            isotropies = [False]
        else:
            isotropies = [True, False]
        passes += [(covariant, isotropic) for isotropic in isotropies]
    return passes


def _model_name(name: str, is_covariant: bool, is_isotropic: bool) -> str:
    return f"{name}.{'c' if is_covariant else 'v'}.{'i' if is_isotropic else 'a'}"


def _resolve_warm_start(name: str, fold: Fold, full_name: str, is_covariant: bool) -> bool:
    """Resolve ``is_read=None`` for one model pass: reuse the trained folder
    when present, otherwise seed it by copying the nearest trained ancestor in
    the model hierarchy — a covariant model prefers its variant twin, any
    anisotropic model falls back to its isotropic sibling (reference
    run.py:79-88). Returns the concrete ``is_read`` (False = no ancestor
    found, train from scratch)."""
    if (fold.folder / full_name).exists():
        return True
    ancestors = [name + '.v' + full_name[-2:]] if is_covariant else []
    ancestors.append(full_name[:-2] + '.i')
    for ancestor in ancestors:
        if (fold.folder / ancestor).exists():
            Data.copy(src_folder=fold.folder / ancestor, dst_folder=fold.folder / full_name)
            return True
    return False


def _gpr_fold_batched(name: str, repo: Repository, is_read: Optional[bool],
                      is_covariant: Optional[bool], is_isotropic: Optional[bool],
                      kernel_parameters: Optional[Dict], likelihood_variance,
                      is_tested: bool, **kwargs) -> Optional[List[str]]:
    """Calibrate each non-covariant model pass of EVERY equal-shape fold as
    ONE vmapped L-BFGS descent (models.gp.calibrate_variant_folds — the
    fold-parallel engine the reference's Python fold loop leaves unexploited,
    reference user/run.py:60-61). The descent core is the same
    ``_calibrate_variant_core`` the sequential path runs — same objective,
    same stopping rule — but vmap changes fusion/reduction order, so long
    descents on multimodal likelihoods may stop at a different (equally
    valid) optimum than the per-fold loop. Parameters, meta and LML are
    written back per fold through the standard persistence path.

    Returns the constructed model names, or ``None`` when the workload is
    ineligible (covariant passes present, unequal fold shapes, large-N
    folds, or per-fold calibration options that diverge) — the caller then
    runs the sequential per-fold loop."""
    import jax
    import jax.numpy as jnp
    passes = _model_passes(is_covariant, is_isotropic)
    if any(covariant for covariant, _ in passes) or len(list(repo.folds)) < 2:
        return None
    names: List[str] = []
    for pass_index, (covariant, isotropic) in enumerate(passes):
        full_name = _model_name(name, covariant, isotropic)
        gps, metas, kopts, lopts = [], [], [], []
        for k in repo.folds:
            fold = Fold(repo, k)
            read = is_read if pass_index == 0 else None
            if read is None:
                read = _resolve_warm_start(name, fold, full_name, covariant)
            gp_k = (MOGP(full_name, fold, read, covariant, isotropic) if read else
                    MOGP(full_name, fold, read, covariant, isotropic,
                         kernel_parameters, likelihood_variance))
            meta, ko, lo = gp_k._calibration_options(**{key: (dict(v) if isinstance(v, dict) else v)
                                                        for key, v in kwargs.items()})
            gps.append(gp_k)
            metas.append(meta)
            kopts.append(ko)
            lopts.append(lo)
        # Batch folds in groups of identical (shape, calibration options) —
        # the improper fold (its N differs) and any odd-shaped folds run
        # through the standard per-fold calibrate in place.
        groups: Dict[tuple, List[int]] = {}
        for i, (g, m, ko, lo) in enumerate(zip(gps, metas, kopts, lopts)):
            large = g._N >= int(m.get('large_n_threshold', g.LARGE_N_THRESHOLD))
            key = ('large', i) if large else (
                g._N, g._M, g._L, int(m.get('maxiter', 5000)),
                float(m.get('gtol', 1e-16)), str(ko), str(lo))
            groups.setdefault(key, []).append(i)
        if pass_index == 0 and not any(len(v) > 1 for v in groups.values()):
            return None          # nothing to batch: sequential loop instead
        from romcomma_tpu.models.gp import calibrate_variant_folds
        from romcomma_tpu.models.params import variant_mask, variant_constrain
        for key, idxs in groups.items():
            if len(idxs) < 2:
                i = idxs[0]
                with contexts.Timer(f'fold.{gps[i].fold.meta["k"]} {full_name} GPR'):
                    gps[i].calibrate(**kwargs)
                    if is_tested:
                        gps[i].test()
                continue
            maxiter, gtol = key[3], key[4]
            i0 = idxs[0]
            mask = variant_mask(kernel_variance=kopts[i0]['variance'],
                                lengthscales=kopts[i0]['lengthscales']['variant'],
                                noise=lopts[i0]['variance'])
            raws = jax.tree.map(lambda *leaves: jnp.stack(leaves),
                                *[gps[i]._variant_raw() for i in idxs])
            xs = jnp.asarray(np.stack([gps[i]._X for i in idxs]))
            ys = jnp.asarray(np.stack([gps[i]._Y for i in idxs]))
            with contexts.Timer(f'fold-batched x{len(idxs)} {full_name} GPR'):
                raw_opt, lml, iters = calibrate_variant_folds(
                    raws, mask, xs, ys, maxiter=maxiter, gtol=gtol)
                c_all, lml, iters = jax.device_get(
                    (variant_constrain(raw_opt), lml, iters))
                for j, i in enumerate(idxs):
                    c_j = jax.tree.map(lambda leaf: leaf[j], c_all)
                    gps[i]._finish_variant_calibration(
                        c_j, lml[j], iters[j], metas[i], kopts[i], lopts[i],
                        recompute_lml=True)
                    if is_tested:
                        gps[i].test()
        names.append(full_name)
    return names


def gpr(name: str, repo: Repository, is_read: Optional[bool], is_covariant: Optional[bool],
        is_isotropic: Optional[bool], ignore_exceptions: bool = False,
        kernel_parameters: Optional[Dict] = None, likelihood_variance=None,
        is_calibrated: bool = True, is_tested: bool = True,
        fold_parallel: Optional[bool] = None, **kwargs) -> List[str]:
    """Undertake GPR on a Fold, or across every Fold in a Repository.
    Returns the list of model names constructed (reference run.py:35-102).

    ``fold_parallel`` (repository-level only): calibrate every fold's model
    in one vmapped descent instead of the per-fold Python loop. ``None``
    (default) auto-enables when eligible and silently falls back to the
    sequential loop otherwise; ``False`` forces the sequential loop."""
    if not isinstance(repo, Fold):
        names_opt: Optional[List[str]] = None
        if fold_parallel is not False and is_calibrated:
            try:
                names_opt = _gpr_fold_batched(name, repo, is_read, is_covariant,
                                              is_isotropic, kernel_parameters,
                                              likelihood_variance, is_tested,
                                              **kwargs)
            except Exception as error:
                if fold_parallel:       # explicitly requested: surface it
                    raise
                # Auto mode: fall back sequentially, but never silently —
                # a genuine calibration bug or OOM must leave a trace.
                warnings.warn(f'fold-parallel GPR failed ({type(error).__name__}: '
                              f'{error}); falling back to the sequential fold loop.',
                              RuntimeWarning, stacklevel=2)
                names_opt = None
        if names_opt is not None:
            names = names_opt
        else:
            names = []
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
    names = []
    for pass_index, (covariant, isotropic) in enumerate(_model_passes(is_covariant, is_isotropic)):
        full_name = _model_name(name, covariant, isotropic)
        # Only the first pass honours the caller's is_read; later passes
        # warm-start from the model trained by an earlier pass.
        read = is_read if pass_index == 0 else None
        if read is None:
            read = _resolve_warm_start(name, repo, full_name, covariant)
        with contexts.Timer(f'fold.{repo.meta["k"]} {full_name} GPR'):
            try:
                gp = (MOGP(full_name, repo, read, covariant, isotropic) if read else
                      MOGP(full_name, repo, read, covariant, isotropic,
                           kernel_parameters, likelihood_variance))
                if is_calibrated:
                    gp.calibrate(**kwargs)
                if is_tested:
                    gp.test()
            except BaseException:
                if not ignore_exceptions:
                    raise
        names.append(full_name)
    return names


def rom(name: str, repo: Repository, m: int = 1, **kwargs) -> List[Dict[str, Any]]:
    """Undertake ROM (iterative input-basis rotation) across the Folds of a
    Repository. Thin orchestration wrapper over rom.rom.run_rom — the
    reference has no working equivalent (its ROM is dormant, rom/old.py)."""
    from romcomma_tpu.rom.rom import run_rom
    return run_rom(name, repo, m=m, **kwargs)


def _gsa_fold_batched(name: str, repo: Repository, is_covariant: Optional[bool],
                      is_isotropic: Optional[bool], kinds, m: int,
                      is_error_calculated: bool, **kwargs) -> Optional[List[Path]]:
    """Run every equal-shape fold's GSA (all model passes, all kinds) through
    ONE vmapped program per pass via marginalize_all_kinds_folds — the
    analytics analog of _gpr_fold_batched (run.gsa's per-fold loop is its
    own dispatch chain per fold, reference user/run.py:130-147). Odd-shaped
    folds (the improper fold) run through the standard single-fold call in
    place. Returns the result paths of the last fold, or ``None`` when the
    workload is ineligible (fewer than 2 folds, or at-scale N where the
    host-paced per-fold route is mandatory)."""
    from romcomma_tpu.gsa.calibrators import (
        GSA_HOST_PACED_AT_N, marginalize_all_kinds, marginalize_all_kinds_folds)
    fold_ks = list(repo.folds)
    if len(fold_ks) < 2:
        return None
    names_by_fold: Dict[int, List[Path]] = {}
    for covariant, isotropic in _model_passes(is_covariant, is_isotropic):
        full_name = _model_name(name, covariant, isotropic)
        loaded = []
        for k in fold_ks:
            fold = Fold(repo, k)
            gp = MOGP(full_name, fold, is_read=True, is_covariant=covariant,
                      is_isotropic=isotropic)
            loaded.append((fold, gp))
        # Eligibility BEFORE constructing Sobol objects: their constructors
        # create gsa output folders on disk, so an ineligible at-scale run
        # must not pay those side effects twice when the sequential loop
        # re-creates them (ADVICE r4).
        if any(gp.N >= GSA_HOST_PACED_AT_N for _, gp in loaded):
            return None
        per_fold = [(fold, gp, [Sobol(gp, kind, m, is_error_calculated,
                                      **kwargs) for kind in kinds])
                    for fold, gp in loaded]
        groups: Dict[tuple, List[int]] = {}
        for i, (_, gp, _) in enumerate(per_fold):
            groups.setdefault((gp.N, gp.M, gp.L), []).append(i)
        for idxs in groups.values():
            batch = [per_fold[i] for i in idxs]
            kind_slices = {s.kind.name: tuple(s._m_dataset)
                           for s in batch[0][2]}
            if len(idxs) >= 2:
                with contexts.Timer(f'fold-batched x{len(idxs)} {full_name} GSA'):
                    results = marginalize_all_kinds_folds(
                        [gp for _, gp, _ in batch], kind_slices,
                        is_error_calculated, **batch[0][2][0].meta)
            else:
                results = [marginalize_all_kinds(batch[0][1], kind_slices,
                                                 is_error_calculated,
                                                 **batch[0][2][0].meta)]
            for i, ((fold, gp, sobols), (by_kind, extras)) in zip(
                    idxs, zip(batch, results)):
                fold_names = names_by_fold.setdefault(i, [])
                for s in sobols:
                    folder = s.calibrate(
                        precomputed=(by_kind[s.kind.name], extras)).get('folder')
                    fold_names.append(Path(folder).relative_to(fold.folder))
    # parity with the sequential loop: return the LAST fold's names
    return names_by_fold[len(fold_ks) - 1]


def gsa(name: str, repo: Repository, is_covariant: Optional[bool], is_isotropic: Optional[bool],
        kinds: 'GSA.Kind | Sequence[GSA.Kind]' = None, m: int = -1,
        ignore_exceptions: bool = False, is_error_calculated: bool = False,
        fold_parallel: Optional[bool] = None, **kwargs) -> List[Path]:
    """Undertake GSA on a Fold, or recursively across the Folds in a Repository
    (reference run.py:105-158).

    ``fold_parallel`` (repository-level only): run every equal-shape fold's
    GSA as one vmapped program set instead of the per-fold loop. ``None``
    (default) auto-enables when eligible and falls back (with a warning) to
    the sequential loop on failure; ``False`` forces the sequential loop."""
    kinds = GSA.ALL_KINDS if kinds is None else kinds
    kinds = (kinds,) if isinstance(kinds, GSA.Kind) else kinds
    if not isinstance(repo, Fold):
        names_opt: Optional[List[Path]] = None
        if fold_parallel is not False:
            try:
                names_opt = _gsa_fold_batched(name, repo, is_covariant,
                                              is_isotropic, kinds, m,
                                              is_error_calculated, **kwargs)
            except Exception as error:
                if fold_parallel:       # explicitly requested: surface it
                    raise
                warnings.warn(f'fold-parallel GSA failed ({type(error).__name__}: '
                              f'{error}); falling back to the sequential fold '
                              f'loop.', RuntimeWarning, stacklevel=2)
                names_opt = None
        if names_opt is not None:
            names = names_opt
        else:
            names = []
            for k in repo.folds:
                names = gsa(name, Fold(repo, k), is_covariant, is_isotropic,
                            kinds, m, ignore_exceptions, is_error_calculated,
                            **kwargs)
        results.Collect({'S': {}, 'V': {}} | ({'T': {}, 'W': {}} if is_error_calculated else {}),
                        {str(n): {} for n in names}, ignore_exceptions).from_folds(repo, True)
        for n in names:
            shutil.copyfile(repo.fold_folder(repo.folds.start) / 'meta.json',
                            repo.folder / n / 'meta.json')
        return names
    names = []
    for covariant, isotropic in _model_passes(is_covariant, is_isotropic):
        full_name = _model_name(name, covariant, isotropic)
        with contexts.Timer(f'fold.{repo.meta["k"]} {full_name} GSA'):
            try:
                from romcomma_tpu.gsa.calibrators import marginalize_all_kinds
                gp = MOGP(full_name, repo, is_read=True, is_covariant=covariant,
                          is_isotropic=isotropic)
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
            except BaseException:
                if not ignore_exceptions:
                    raise
    return names
