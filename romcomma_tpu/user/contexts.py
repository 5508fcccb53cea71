"""Context managers: Timer and Environment (reference: romcomma/user/contexts.py).

``Environment`` configures the JAX runtime in place of the reference's
tf.device + gpflow-config context (contexts.py:55-83): it selects a device
platform, asserts the x64 policy (the reference forces float64), and
optionally dumps a jax.profiler trace — the observability upgrade the
reference lacks (SURVEY.md §5.1).
"""

from __future__ import annotations

from contextlib import contextmanager
from datetime import timedelta
from time import time
from typing import Optional

import jax


@contextmanager
def Timer(name: str = '', is_inline: bool = True):
    """Print-based wall-clock timing context (reference contexts.py:32-52)."""
    _enter = time()
    if name != '':
        if is_inline:
            print(f'Running {name}', end='', flush=True)
        else:
            print(f'Running {name}...', flush=True)
    yield
    if name != '':
        _exit = time()
        if is_inline:
            print(f' took {timedelta(seconds=int(_exit - _enter))}.')
        else:
            print(f'...took {timedelta(seconds=int(_exit - _enter))}.')


@contextmanager
def Environment(name: str = '', device: str = '', profile_dir: Optional[str] = None, **kwargs):
    """Runtime environment context.

    Args:
        name: Printed label.
        device: 'CPU' / 'TPU' / '' (automatic). A '/CPU'-style suffix as used
            by the reference is accepted and mapped to the JAX platform.
        profile_dir: If given, a jax.profiler trace is written there.
    """
    with Timer(name):
        d = device.upper()
        platform = None
        if 'CPU' in d:
            platform = 'cpu'
        elif 'GPU' in d:
            platform = 'gpu'
        elif 'TPU' in d:
            platform = None  # default backend (tpu when present)
        if platform is not None:
            try:
                jax.config.update('jax_platforms', platform)
            except RuntimeError:
                pass  # backends already initialized; keep current platform
        backend = jax.default_backend()
        from romcomma_tpu.base.definitions import FLOAT
        print(f' using JAX({backend}, working dtype={FLOAT().name})...', flush=True)
        # x64 CAPABILITY is always on; the working dtype (FLOAT()) is what
        # decides whether the training programs compile in f64.
        if backend == 'tpu' and FLOAT().itemsize == 8:
            print(' WARNING: float64 on TPU is emulated, slow to compile, and '
                  'has been observed to crash the XLA TPU compiler on the '
                  'L-BFGS training program. Set ROMCOMMA_X64=0 (before import) '
                  'for the supported f32 TPU fast path; keep x64 for CPU '
                  'verification runs.', flush=True)
        if profile_dir:
            with jax.profiler.trace(profile_dir):
                yield
        else:
            yield
        print('...Running ' + name, end='')
