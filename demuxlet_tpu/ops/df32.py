"""Double-single ("df32") arithmetic: ~47-bit-mantissa reals as unevaluated
(hi, lo) float32 pairs, built from error-free transforms (Dekker/Knuth).

Why: the TPU VPU has no f64 ALUs — XLA emulates f64 ~50x slower than f32 —
but exact-mode parity (models/likelihood.py; reference pass-2 at
cmd_cram_demuxlet.cpp:671-709 is plain f64) only needs ~1e-10 absolute
agreement on the printed LLKs, far below f32 yet comfortably within df32's
~6e-15 relative per-op error. Every function here is branch-free elementwise
jnp, so the same code runs under XLA fusion (the exp/normalize front) and
inside Mosaic/Pallas kernels (ops/pallas_pair_exact.py).

No-FMA dependence: two_prod uses the Veltkamp split (SPLIT = 2^12+1), which
is error-free with plain IEEE f32 mul/add; if the compiler contracts a*b-p
into an FMA the error term only becomes MORE exact.

Domain notes (validated by tests/test_df32.py):
  exp: any x <= ~80; underflows cleanly to exactly 0 below -85.
  log: x in (1e-38, 2e38); the pair kernel feeds inner in [~1e-6, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SPLIT = 4097.0  # 2^12 + 1: Veltkamp split point for 24-bit mantissas

import numpy as _np

# df32 constants as numpy scalars (jaxpr literals — a pallas kernel may
# not close over device-array constants)
_LN2_HI = _np.float32(0.6931471824645996)
_LN2_LO = _np.float32(-1.904654323148236e-09)
_INV_LN2 = _np.float32(1.4426950408889634)
_THIRD_HI = _np.float32(0.3333333432674408)
_THIRD_LO = _np.float32(-9.934107481068821e-09)
_FIFTH_HI = _np.float32(0.20000000298023224)
_FIFTH_LO = _np.float32(-2.9802322387695312e-09)


def two_sum(a, b):
    """Error-free a + b = s + e (Knuth)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free a + b = s + e; requires |a| >= |b| or a == 0 (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def vsplit(a):
    """Veltkamp split: a = hi + lo with 12-bit halves (exact).

    No fence here: the (c - a) subtraction inside the split was measured
    contraction-safe under XLA CPU fusion (two_prod/mul jit == eager
    before any fencing existed); only the PRODUCT feeding a downstream
    error-free sum needs _opaque (see two_prod/div). tests/test_df32.py
    runs everything jitted to catch a backend that breaks this."""
    c = _np.float32(SPLIT) * a
    hi = c - (c - a)
    return hi, a - hi


_F32_MAX = _np.float32(3.4028235e38)


def _opaque(x):
    """Fence a product against FMA contraction.

    XLA's backends (LLVM on CPU; potentially Mosaic on TPU) may contract
    `s = a*b` followed by `c + s` into fma(a, b, c) — a SINGLE rounding,
    which silently breaks any error-free transform that relies on s being
    the ROUNDED product (e.g. div's residual r = a - round(q1*b), measured
    5.7e-8 relative error under jit without a fence). A clamp to the full
    finite f32 range is value-preserving and opaque to contraction at the
    LLVM level, where lax.optimization_barrier is dropped too early to
    help (verified empirically: barrier and bitcast fences both fail,
    min/max holds). Contraction inside the error term (ah*bh - p) is
    harmless — it only makes the term exact.
    """
    return jnp.minimum(jnp.maximum(x, -_F32_MAX), _F32_MAX)


_F32_BRK = _np.float32(3.0e38)  # < _F32_MAX: see two_prod's fma branch


def _cse_break(x):
    """Value-preserving (for |x| <= 3e38) clamp that cannot collapse
    with an _opaque clamp chain — bounds differ."""
    return jnp.minimum(jnp.maximum(x, -_F32_BRK), _F32_BRK)


# When the backend contracts `mul + sub` into a single-rounded FMA,
# the residual e = a*b - p is EXACT in one op (Dekker's theorem: the
# rounding error of a product is representable) and the Veltkamp split's
# ~15 ops collapse to 2. benchmarks/probe_fma.py verifies the backend's
# semantics on-device; tests/test_df32.py re-verifies per test run before
# exercising the fma path. Off by default — the split path is
# contraction-agnostic and always sound.
_USE_FMA = False


def use_fma(enabled: bool) -> bool:
    """Select the FMA two_prod (returns the previous setting).

    Only sound on backends where probe_fma reports ACTIVE+single-rounded,
    and only under jit — EAGER dispatch executes ops one by one and the
    residual folds to zero (df degenerates to f32). Callers must flip
    BEFORE tracing (jit caches the code path taken at trace time)."""
    global _USE_FMA
    prev = _USE_FMA
    _USE_FMA = bool(enabled)
    return prev


def two_prod(a, b):
    """Error-free a * b = p + e (Dekker split, or FMA when enabled)."""
    if _USE_FMA:
        p = _opaque(a * b)
        # _cse_break(a) keeps the residual multiply a DISTINCT node from
        # p's (so the backend contracts this mul+sub into fma(a, b, -p)
        # = the exact residual); it uses a different clamp bound than
        # _opaque because clamp(clamp(x)) with equal bounds collapses,
        # the muls CSE, and the residual folds to zero (seen in div,
        # whose q1 is already _opaque-clamped)
        e = _cse_break(a) * b - p
        return p, e
    p = _opaque(a * b)
    ah, al = vsplit(a)
    bh, bl = vsplit(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def add(ah, al, bh, bl):
    """df32 + df32, accurate variant (~3e-15 relative)."""
    sh, se = two_sum(ah, bh)
    th, te = two_sum(al, bl)
    se = se + th
    sh, se = fast_two_sum(sh, se)
    se = se + te
    return fast_two_sum(sh, se)


def add_pos(ah, al, bh, bl):
    """df32 + df32 for SAME-SIGN operands (sloppy Dekker add2, ~2^-47
    relative): 11 ops vs 20 for the accurate variant. UNSAFE under
    cancellation — used only for probability sums, which are
    non-negative by construction."""
    sh, se = two_sum(ah, bh)
    se = se + (al + bl)
    return fast_two_sum(sh, se)


def add_f32(ah, al, b):
    """df32 + f32."""
    sh, se = two_sum(ah, b)
    se = se + al
    return fast_two_sum(sh, se)


def mul(ah, al, bh, bl):
    """df32 * df32."""
    p, e = two_prod(ah, bh)
    e = e + (ah * bl + al * bh)
    return fast_two_sum(p, e)


def mul_f32(ah, al, b):
    """df32 * f32 (b treated as exact)."""
    p, e = two_prod(ah, b)
    e = e + al * b
    return fast_two_sum(p, e)


def div(ah, al, bh, bl):
    """df32 / df32, ~1e-14 relative.

    ONE hardware divide (the f32 reciprocal seed) + exact two_prod
    residual corrections by multiply — VPU divides are many-cycle ops and
    this sits inside the kernel's per-(j,k,a) log."""
    r = _np.float32(1.0) / bh
    q1 = _opaque(ah * r)
    p, e = two_prod(q1, bh)
    rh, rl = add(ah, al, -p, -(e + q1 * bl))
    q2 = _opaque(rh * r)
    p2, e2 = two_prod(q2, bh)
    rh2, _ = add(rh, rl, -p2, -(e2 + q2 * bl))
    q3 = rh2 * r
    qh, ql = fast_two_sum(q1, q2)
    return add_f32(qh, ql, q3)


# ---------------------------------------------------------------- exp/log
def _bits(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _from_bits(i):
    return jax.lax.bitcast_convert_type(i, jnp.float32)


def _pow2(q):
    """2^q for integer-valued f32 q in [-126, 127], exact via bit build."""
    qi = q.astype(jnp.int32)
    return _from_bits((qi + 127) << 23)


def _df_const(x):
    """f64 constant -> (hi, lo) f32 pair."""
    import numpy as np

    hi = np.float32(x)
    return hi, np.float32(np.float64(x) - np.float64(hi))


# Taylor 1/n! for n = 12 .. 2 (Horner order) as df pairs: an f32-rounded
# coefficient c_n contributes |c_n|*3e-8*r^(n-1) of absolute error — up to
# ~6e-10 for 1/3! — so the low-order coefficients need both words.
import math as _math

_EXP_COEFFS = tuple(_df_const(1.0 / _math.factorial(n))
                    for n in range(12, 1, -1))


def exp(xh, xl):
    """df32 exp. Relative error ~3e-14 (tested vs f64/f128).

    x = k*ln2 + r, |r| <= ln2/2; e^r by 12-term Taylor in df Horner form;
    exact 2^k scale. Inputs below -85 underflow to exactly 0 (downstream
    the +1e-6 smoothing floor absorbs this, mirroring the reference's own
    f64 denormal region which is far below the 1e-6 floor).
    """
    k = jnp.round(xh * _INV_LN2)  # integer-valued f32
    # r = x - k*ln2 as df (k*_LN2_HI is exact only for small k: use
    # two_prod to keep the full product error-free for any k)
    p1, e1 = two_prod(k, _LN2_HI)
    rh, rl = add(xh, xl, -p1, -(e1 + k * _LN2_LO))
    # Horner: p = (((c12*r + c11)*r + ... + c2)*r + 1)*r + 1
    ph = jnp.broadcast_to(_EXP_COEFFS[0][0], xh.shape)
    pl = jnp.broadcast_to(_EXP_COEFFS[0][1], xh.shape)
    for ch, cl in _EXP_COEFFS[1:]:
        ph, pl = mul(ph, pl, rh, rl)
        ph, pl = add(ph, pl, ch, cl)
    ph, pl = mul(ph, pl, rh, rl)
    ph, pl = add_f32(ph, pl, _np.float32(1.0))
    ph, pl = mul(ph, pl, rh, rl)
    ph, pl = add_f32(ph, pl, _np.float32(1.0))
    under = xh < _np.float32(-85.0)
    # split the 2^k scale so each half stays in range (k in [-123, 123])
    kc = jnp.clip(k, _np.float32(-123.0), _np.float32(123.0))
    half1 = _pow2(jnp.trunc(kc * _np.float32(0.5)))
    half2 = _pow2(kc - jnp.trunc(kc * _np.float32(0.5)))
    zero = _np.float32(0.0)
    ph = jnp.where(under, zero, ph * half1 * half2)
    pl = jnp.where(under, zero, pl * half1 * half2)
    return ph, pl


def log(xh, xl):
    """df32 log for normal positive x. Abs error ~2e-14 (tested).

    x = 2^e * m with m in [sqrt(1/2), sqrt(2)); log m = 2 atanh(s),
    s = (m-1)/(m+1) <= 0.1716; series head in df, tail in f32.
    """
    bits = _bits(xh)
    e = ((bits >> 23) & 0xFF) - 127
    m = _from_bits((bits & 0x007FFFFF) | 0x3F800000)  # [1, 2)
    big = m > _np.float32(1.4142135)
    m = jnp.where(big, m * _np.float32(0.5), m)  # exact halving
    e = jnp.where(big, e + 1, e).astype(jnp.float32)
    # scale the low word to the mantissa's frame: xl * 2^-e (exact)
    mlo = xl * _pow2(-e)
    # num = m - 1 exact on [0.5, 2) (Sterbenz); renormalize with mlo
    nh, nl = two_sum(m - _np.float32(1.0), mlo)
    dh, dl = two_sum(m, _np.float32(1.0))
    dl = dl + mlo
    sh, sl = div(nh, nl, dh, dl)
    s2h, s2l = mul(sh, sl, sh, sl)
    # q = s^2/3 + s^4/5 (both df: f32-rounded 1/3, 1/5 would leave
    # ~1e-11 absolute) + s^6*(1/7 + ...) (f32 tail, < 4e-6)
    qh, ql = mul(s2h, s2l, _THIRD_HI, _THIRD_LO)
    s4h, s4l = mul(s2h, s2l, s2h, s2l)
    f5h, f5l = mul_f32(s4h, s4l, _FIFTH_HI)
    f5h, f5l = add(f5h, f5l, s4h * _FIFTH_LO, jnp.zeros_like(s4h))
    qh, ql = add(qh, ql, f5h, f5l)
    s2 = s2h
    tail = s2 * s2 * s2 * (
        _np.float32(1 / 7.0) + s2 * (_np.float32(1 / 9.0) + s2 * (
            _np.float32(1 / 11.0) + s2 * (_np.float32(1 / 13.0)
                                          + s2 * _np.float32(1 / 15.0)))))
    qh, ql = add_f32(qh, ql, tail)
    qh, ql = add_f32(qh, ql, _np.float32(1.0))
    lh, ll = mul(sh, sl, qh, ql)
    lh, ll = lh * 2, ll * 2  # exact
    th, tl = two_prod(e, _LN2_HI)
    tl = tl + e * _LN2_LO
    return add(lh, ll, th, tl)


# ---------------------------------------------------------------- host io
def from_f64(x):
    """Split a float64 array into (hi, lo) f32 planes (numpy, host side)."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def to_f64(hi, lo):
    import numpy as np

    return np.asarray(hi, dtype=np.float64) + np.asarray(lo, dtype=np.float64)
