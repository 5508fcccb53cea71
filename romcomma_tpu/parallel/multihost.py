"""Multi-host (DCN) fold/sweep distribution.

The reference has no multi-process facility: cluster usage is one SLURM job
per sweep cell (reference JADE_INSTRUCTIONS.md:171-196), relying on the fact
that every stage persists to its own folder of CSV + meta.json. This module
makes that embarrassing parallelism first-class for TPU pods/slices: folds
(and sweep cells) are deterministically partitioned across processes, each
process trains only its share on its local chips, and the on-disk tree is
the coordination-free medium — aggregation (``collect``) runs once when all
shares exist, exactly like a re-run of the reference with ``is_read=True``.

Two deployment styles, one code path:
  - **jax.distributed** (TPU pod over DCN): call :func:`init` first; process
    identity comes from ``jax.process_index()/process_count()``.
  - **launcher-driven** (SLURM array / parallel SSH, shared filesystem): set
    ``ROMCOMMA_PROCESS_ID`` / ``ROMCOMMA_NUM_PROCESSES`` per task — no
    inter-process connectivity required at all.

Within each process, the intra-process scaling axes ('l','n' meshes,
distributed dense path) are unchanged — this layer only decides WHICH folds
a process works on. ICI stays inside the model; only embarrassingly-parallel
work crosses DCN (SURVEY.md §2.4 checklist row 'communication backend').
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Callable, List, Optional, Sequence

from romcomma_tpu.data.storage import Fold, Repository


def init(coordinator_address: Optional[str] = None,
         num_processes: Optional[int] = None,
         process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed (TPU pod / multi-host). No-op when the
    launcher-driven env vars are set or when running single-process."""
    if 'ROMCOMMA_NUM_PROCESSES' in os.environ:
        return
    import jax
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def process_identity() -> tuple:
    """(process_id, num_processes) — launcher env vars win, then
    jax.process_index/count, then (0, 1)."""
    if 'ROMCOMMA_NUM_PROCESSES' in os.environ:
        return (int(os.environ.get('ROMCOMMA_PROCESS_ID', '0')),
                int(os.environ['ROMCOMMA_NUM_PROCESSES']))
    try:
        import jax
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def my_share(items: Sequence[Any], process_id: Optional[int] = None,
             num_processes: Optional[int] = None) -> List[Any]:
    """Deterministic round-robin partition of ``items`` for this process.
    Round-robin (not block) so heterogeneous cost along the sequence — e.g.
    the improper fold, or a sweep's growing N — spreads across processes."""
    pid, nproc = process_identity()
    pid = pid if process_id is None else process_id
    nproc = nproc if num_processes is None else num_processes
    return [item for i, item in enumerate(items) if i % nproc == pid]


def my_folds(repo: Repository, **kwargs) -> List[int]:
    """The fold indices this process owns."""
    return my_share(list(repo.folds), **kwargs)


def gpr(name: str, repo: Repository, is_read: Optional[bool],
        is_covariant: Optional[bool], is_isotropic: Optional[bool],
        ignore_exceptions: bool = False, **kwargs) -> List[str]:
    """user.run.gpr over ONLY this process's folds (no aggregation).
    Run :func:`collect_gpr` once afterwards — e.g. from process 0 behind a
    barrier, or as a separate collect-only job (reference style)."""
    from romcomma_tpu.user import run
    names: List[str] = []
    for k in my_folds(repo):
        names = run.gpr(name, Fold(repo, k), is_read, is_covariant,
                        is_isotropic, ignore_exceptions, **kwargs)
    return names


def gsa(name: str, repo: Repository, is_covariant: Optional[bool],
        is_isotropic: Optional[bool], ignore_exceptions: bool = False,
        is_error_calculated: bool = False, **kwargs) -> List[Path]:
    """user.run.gsa over ONLY this process's folds (no aggregation)."""
    from romcomma_tpu.user import run
    names: List[Path] = []
    for k in my_folds(repo):
        names = run.gsa(name, Fold(repo, k), is_covariant, is_isotropic,
                        ignore_exceptions=ignore_exceptions,
                        is_error_calculated=is_error_calculated, **kwargs)
    return names


def missing_shares(names: Sequence[Any], repo: Repository) -> List[Path]:
    """Per-fold result folders that are NOT yet on disk — the pre-aggregation
    completeness check for launcher-driven mode, where :func:`barrier` cannot
    sequence processes (no connectivity)."""
    return [repo.fold_folder(k) / str(n)
            for k in repo.folds for n in names
            if not (repo.fold_folder(k) / str(n)).exists()]


def _check_shares(names: Sequence[Any], repo: Repository,
                  ignore_exceptions: bool) -> None:
    missing = missing_shares(names, repo)
    if missing and not ignore_exceptions:
        raise FileNotFoundError(
            'collect called before every fold share is on disk: missing '
            + ', '.join(str(p) for p in missing[:8])
            + (' ...' if len(missing) > 8 else ''))


def collect_gpr(names: Sequence[str], repo: Repository,
                ignore_exceptions: bool = True) -> None:
    """Aggregate per-fold GPR results across ALL folds (run once, after
    every process's share is on disk) — same Collects as user.run.gpr's
    repository recursion (reference run.py:62-66)."""
    from romcomma_tpu.user import results
    _check_shares(names, repo, ignore_exceptions)
    results.Collect({'test': {'header': [0, 1]},
                     'test_summary': {'header': [0, 1], 'index_col': 0}},
                    {n: {} for n in names}, ignore_exceptions).from_folds(repo, True)
    results.Collect({'variance': {}, 'log_marginal': {}},
                    {f'{n}/likelihood': {} for n in names},
                    ignore_exceptions).from_folds(repo, True)
    results.Collect({'variance': {}, 'lengthscales': {}},
                    {f'{n}/kernel': {} for n in names},
                    ignore_exceptions).from_folds(repo, True)


def collect_gsa(names: Sequence[Path], repo: Repository,
                is_error_calculated: bool = False,
                ignore_exceptions: bool = True) -> None:
    """Aggregate per-fold GSA results (reference run.py:134-137)."""
    import shutil
    from romcomma_tpu.user import results
    _check_shares(names, repo, ignore_exceptions)
    results.Collect({'S': {}, 'V': {}}
                    | ({'T': {}, 'W': {}} if is_error_calculated else {}),
                    {str(n): {} for n in names},
                    ignore_exceptions).from_folds(repo, True)
    for n in names:
        shutil.copyfile(repo.fold_folder(repo.folds.start) / 'meta.json',
                        repo.folder / n / 'meta.json')


def barrier() -> None:
    """Block until every jax.distributed process reaches this point. In
    launcher-driven mode there is no connectivity: the caller sequences the
    collect step externally (e.g. a dependent SLURM job), so this is a no-op."""
    if 'ROMCOMMA_NUM_PROCESSES' in os.environ:
        return
    pid, nproc = process_identity()
    if nproc == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices('romcomma_multihost_barrier')
