"""df32 (double-single f32) arithmetic accuracy vs float64/longdouble."""

import numpy as np
import jax.numpy as jnp

from demuxlet_tpu.ops import df32


def _df(x):
    hi, lo = df32.from_f64(x)
    return jnp.asarray(hi), jnp.asarray(lo)


def _back(pair):
    return df32.to_f64(np.asarray(pair[0]), np.asarray(pair[1]))


def test_split_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(10000) * np.exp(rng.uniform(-30, 30, 10000))
    hi, lo = df32.from_f64(x)
    np.testing.assert_allclose(
        hi.astype(np.float64) + lo.astype(np.float64), x, rtol=3e-15
    )


def _check(op, a, b, ref, tol, jit=False):
    import jax

    fn = jax.jit(op) if jit else op
    got = _back(fn(*_df(a), *_df(b)))
    # scale-relative: near-cancellation results are limited by the df
    # representation error of the INPUTS (~3e-15 * |a|), not the op
    scale = np.maximum(np.abs(a) + np.abs(b), 1e-30)
    err = np.abs(got - ref) / scale
    assert err.max() < tol, (op.__name__, jit, err.max())


def test_add_mul_div():
    rng = np.random.default_rng(1)
    a = rng.uniform(-100, 100, 20000)
    b = rng.uniform(-100, 100, 20000)
    b[np.abs(b) < 1e-3] = 1.0
    for jit in (False, True):
        _check(df32.add, a, b, a + b, 2e-13, jit)
        _check(df32.mul, a, b, a * b, 2e-11, jit)  # scale |a|+|b|, not |ab|
        _check(df32.div, a, b, a / b, 2e-13, jit)
    # tight relative checks on well-conditioned ranges, jitted (the mode
    # that fusion rewrites can break -- see df32._opaque)
    import jax
    a2 = rng.uniform(0.5, 2, 20000)
    b2 = rng.uniform(0.5, 2, 20000)
    for op, ref in ((df32.mul, a2 * b2), (df32.div, a2 / b2)):
        got = _back(jax.jit(op)(*_df(a2), *_df(b2)))
        assert np.abs((got - ref) / ref).max() < 5e-14, op.__name__


def test_add_cancellation():
    """Catastrophic-cancellation sums stay accurate to the inputs'
    df representation error (~3e-15 absolute at unit scale)."""
    rng = np.random.default_rng(2)
    a = rng.uniform(1, 2, 5000)
    b = -a * (1 + rng.uniform(-1e-6, 1e-6, 5000))
    ref = a + b
    got = _back(df32.add(*_df(a), *_df(b)))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-14)


def test_exp_accuracy():
    import jax

    rng = np.random.default_rng(3)
    # full df precision where results are above the lo-word denormal
    # limit (~1e-31); the pair kernel only needs x >= ln(1e-7)
    x = rng.uniform(-20, 2, 20000)
    ref = np.exp(np.asarray(x, dtype=np.longdouble))
    for fn in (df32.exp, jax.jit(df32.exp)):
        got = _back(fn(*_df(x)))
        rel = np.abs(got - ref) / ref
        assert float(rel.max()) < 3e-13, float(rel.max())
    # deep-negative: f32-level relative is fine (values sit far below the
    # 1e-6 smoothing floor; the lo word denormal-flushes)
    x2 = rng.uniform(-85, -20, 5000)
    ref2 = np.exp(np.asarray(x2, dtype=np.longdouble))
    got2 = _back(df32.exp(*_df(x2)))
    assert float((np.abs(got2 - ref2) / ref2).max()) < 1e-6


def test_exp_underflow_zero():
    x = np.array([-90.0, -200.0, -1000.0])
    got = _back(df32.exp(*_df(x)))
    assert (got == 0).all()


def test_log_accuracy():
    rng = np.random.default_rng(4)
    x = np.concatenate([
        rng.uniform(1e-7, 1.0, 20000),          # pair-kernel domain
        np.exp(rng.uniform(-30, 30, 5000)),     # wide domain
        1.0 + rng.uniform(-1e-4, 1e-4, 5000),   # near 1 (relative hard)
    ])
    import jax

    ref = np.log(np.asarray(x, dtype=np.longdouble))
    for fn in (df32.log, jax.jit(df32.log)):
        got = _back(fn(*_df(x)))
        err = np.abs(got - ref)
        # absolute error target (what LLK sums need): ~1e-13
        assert float(err.max()) < 5e-13, float(err.max())


def test_log_exp_roundtrip():
    rng = np.random.default_rng(5)
    x = rng.uniform(-14, 0, 10000)  # log-domain of inner in [1e-6, 1]
    got = _back(df32.log(*df32.exp(*_df(x))))
    assert np.abs(got - x).max() < 5e-13


def test_fma_two_prod_when_backend_contracts():
    """The FMA two_prod (df32.use_fma) is exact wherever the backend
    contracts mul+sub into a single-rounded FMA; probe the jitted
    backend first and skip if it doesn't (the TPU decision runs the same
    probe on-device, benchmarks/probe_fma.py)."""
    import jax
    import pytest

    rng = np.random.default_rng(5)
    a = rng.uniform(0.5, 2.0, 4096).astype(np.float32)
    b = rng.uniform(0.5, 2.0, 4096).astype(np.float32)

    @jax.jit
    def probe(a, b):
        p = df32._opaque(a * b)
        e = df32._opaque(a) * b - p
        return p, e

    p, e = map(np.asarray, probe(jnp.asarray(a), jnp.asarray(b)))
    exact = (a.astype(np.float64) * b.astype(np.float64)
             - p.astype(np.float64)).astype(np.float32)
    if not (e == exact).all():
        pytest.skip("backend does not contract mul+sub into exact FMA")

    prev = df32.use_fma(True)
    try:
        a64 = rng.uniform(-100, 100, 20000)
        b64 = rng.uniform(-100, 100, 20000)
        b64[np.abs(b64) < 1e-3] = 1.0
        # jit-only: eager dispatch never contracts, so the fma residual
        # folds to zero there — use_fma is for compiled kernels only
        _check(df32.mul, a64, b64, a64 * b64, 2e-11, jit=True)
        # div tolerance is slightly looser than the split path's 2e-13:
        # elements where the backend declines to contract fall back to a
        # zero residual in ONE correction term, still ~1e-13 overall
        _check(df32.div, a64, b64, a64 / b64, 5e-13, jit=True)
        # NOTE: this CPU test is a canary for the MECHANISM only. LLVM's
        # contraction is heuristic across larger programs (exp's Horner
        # chain loses residuals on some lanes here), so enabling fma for
        # the exact kernel is gated on the on-device probe + a kernel-vs-
        # f64 parity check on the actual backend, not on this test.
    finally:
        df32.use_fma(prev)
