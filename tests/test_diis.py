"""DIIS edge-case tests: ill-conditioned B matrices, degenerate histories,
and the wild-extrapolation guard (the heuristics at scf/diis.py:62-77).

The production paths only exercise well-behaved histories; these tests
feed pathological ones and assert the update degrades gracefully to the
newest Fock matrix instead of extrapolating along noise directions.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from quantum_compute_dft_tpu.scf.diis import diis_init, diis_update


def _rand_spd(n, rng):
    a = rng.standard_normal((n, n))
    return a @ a.T + n * np.eye(n)


@pytest.fixture
def mats():
    rng = np.random.default_rng(7)
    n = 6
    s = _rand_spd(n, rng)
    w, v = np.linalg.eigh(s)
    x = (v / np.sqrt(w)) @ v.T
    dm = _rand_spd(n, rng) * 0.1
    return n, jnp.asarray(s), jnp.asarray(x), jnp.asarray(dm), rng


def test_identical_focks_degenerate_history(mats):
    # inserting the SAME (F, D) repeatedly makes B rank-1 (maximally
    # ill-conditioned); the extrapolation must return F itself, not NaN
    n, s, x, dm, rng = mats
    f = jnp.asarray(_rand_spd(n, rng))
    st = diis_init(n)
    for _ in range(8):
        st, f_out = diis_update(st, f, dm, s, x)
        assert np.all(np.isfinite(np.asarray(f_out)))
        assert np.allclose(np.asarray(f_out), np.asarray(f), atol=1e-10)


def test_near_duplicate_errors_stay_finite(mats):
    # histories whose error vectors differ by ~1e-13 give cond(B) >> 1e16;
    # the TSVD threshold must drop the noise directions
    n, s, x, dm, rng = mats
    f0 = np.asarray(_rand_spd(n, rng))
    st = diis_init(n)
    f_out = None
    for k in range(8):
        f = jnp.asarray(f0 + 1e-13 * rng.standard_normal((n, n)))
        st, f_out = diis_update(st, f, dm, s, x)
        assert np.all(np.isfinite(np.asarray(f_out))), k
    # the result stays within the cloud of inserted Focks
    assert np.abs(np.asarray(f_out) - f0).max() < 1e-6


def test_wild_extrapolation_guard(mats):
    # force a B matrix whose solution has huge |c| by making two error
    # vectors nearly antiparallel; the sum|c| < 20 guard must reject the
    # extrapolation in favor of the newest Fock matrix
    n, s, x, dm, rng = mats
    st = diis_init(n)
    # craft errors via dm variations that nearly cancel
    f1 = jnp.asarray(_rand_spd(n, rng))
    f2 = jnp.asarray(np.asarray(f1) * (1 + 1e-9))
    st, _ = diis_update(st, f1, dm, s, x)
    st, f_out = diis_update(st, f2, dm, s, x)
    out = np.asarray(f_out)
    assert np.all(np.isfinite(out))
    # graceful: result within the (tiny) span of the two inputs
    lo = np.minimum(np.asarray(f1), np.asarray(f2)) - 1e-6
    hi = np.maximum(np.asarray(f1), np.asarray(f2)) + 1e-6
    assert np.all(out >= lo) and np.all(out <= hi)


def test_zero_error_vectors(mats):
    # at exact self-consistency FDS - SDF = 0 identically; B is all-zero
    n, s, x, dm, rng = mats
    # build F that commutes: F = S (then FDS - SDF = S D S - S D S = 0)
    f = s
    st = diis_init(n)
    for _ in range(4):
        st, f_out = diis_update(st, f, dm, s, x)
        assert np.all(np.isfinite(np.asarray(f_out)))
        assert np.allclose(np.asarray(f_out), np.asarray(f), atol=1e-10)


def test_history_wraparound(mats):
    # more inserts than the history size must wrap without shape errors
    # and keep improving a real SCF-like sequence
    n, s, x, dm, rng = mats
    st = diis_init(n, space=4)
    target = _rand_spd(n, rng)
    for k in range(12):
        f = jnp.asarray(target + 0.5 ** k * _rand_spd(n, rng) * 0.01)
        st, f_out = diis_update(st, f, dm, s, x)
        assert np.all(np.isfinite(np.asarray(f_out)))
    assert int(st.nsaved) == 12
