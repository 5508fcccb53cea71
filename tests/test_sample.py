"""user.sample semantics: DOE designs, the GaussianNoise.Variance quirk
(SURVEY.md §7 'semantic traps'), and noise sampling."""

import numpy as np
import pytest

from romcomma_tpu.user import sample


def test_gaussian_noise_variance_is_determined_quirk():
    """Reference quirk preserved (sample.py:132-150): is_determined=True
    gives a RANDOM trace-normalized SPD matrix; False gives the FIXED
    formula (-1)^(i-j)/(1+|i-j|) — inverted vs the reference docstring."""
    L, mag = 3, 0.5
    fixed = sample.GaussianNoise.Variance(L, mag, is_covariant=True,
                                          is_determined=False).matrix
    expected = np.array([[(-1) ** (i - j) / (1.0 + abs(i - j))
                          for i in range(L)] for j in range(L)]) * mag ** 2
    np.testing.assert_allclose(fixed, expected)
    rnd = sample.GaussianNoise.Variance(L, mag, is_covariant=True,
                                        is_determined=True).matrix
    # random SPD, trace-normalized to L before scaling by magnitude^2
    np.testing.assert_allclose(np.trace(rnd), L * mag ** 2)
    assert np.all(np.linalg.eigvalsh(rnd) >= -1e-12)
    # non-covariant: off-diagonals zeroed
    diag = sample.GaussianNoise.Variance(L, mag, is_covariant=False,
                                         is_determined=False).matrix
    assert np.all(diag[~np.eye(L, dtype=bool)] == 0.0)


def test_variance_format_tags():
    v = sample.GaussianNoise.Variance(2, 0.04, False, True)
    assert f'{v}' == 'd.v.4.00'
    v = sample.GaussianNoise.Variance(2, 0.04, True, False)
    assert f'{v}' == 'u.c.4.00'


def test_doe_designs():
    X = sample.DOE.latin_hypercube(50, 4)
    assert X.shape == (50, 4) and np.all((X >= 0) & (X <= 1))
    # full_factorial is reproduced verbatim from the reference, where it is
    # dead code AND broken (axis=1 concatenation of 1-D arrays; div-by-zero
    # when M divides N) — reference sample.py:69-81, never called upstream.
    with pytest.raises(Exception):
        sample.DOE.full_factorial(27, 3)
    stats = sample.DOE.space_filling_test(X, 16)
    assert all(np.all(np.asarray(v) >= 0) for v in stats.values())


def test_permute_axes_rotation():
    # R = eye[new_order, :] exactly as the reference builds it (sample.py:38-46)
    R = sample.permute_axes([2, 0, 1])
    np.testing.assert_allclose(R, np.eye(3)[[2, 0, 1], :])
    x = np.arange(3.0)[None, :]
    np.testing.assert_allclose(x @ R, [[1.0, 2.0, 0.0]])
    assert abs(abs(np.linalg.det(R)) - 1.0) < 1e-12
    assert sample.permute_axes(None) is None
