"""Exhaustive tests of the Q-format numerics against an independent
integer-arithmetic oracle that implements the reference's C/CUDA macro
semantics directly (lib/layer_cuda.h:207-259) — written from the spec,
not translated from the library under test.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from qmann_tpu.numerics import (
    QFormat,
    ROUND_TOWARD_ZERO,
    ROUND_DOWN,
    float_quant,
    fixed_mul,
    fixed_add,
    fixed_max_float,
    encode_sign_magnitude,
    decode_sign_magnitude,
    quantize_ste,
    bin2gray,
    gray2bin,
)
import jax


# ---------------------------------------------------------------------------
# Integer oracle: CUDA device semantics, EN_QUANT_MODE undefined (C cast =
# truncation toward zero), saturating float->int conversion.
# ---------------------------------------------------------------------------

def oracle_max_float(iwl, frac):
    return np.float32(np.float32((1 << (iwl + frac)) - 1) / np.float32(1 << frac))


def oracle_encode(x, iwl, frac, mode=ROUND_TOWARD_ZERO):
    """float32 -> (sign, magnitude int) per CUDA_FLOAT2FIXED
    (lib/layer_cuda.h:233,246), including the int32 edge semantics:
    the float->int conversion saturates (cvt.rzi.s32.f32), and the
    two's-complement magnitude ~v+1 wraps INT_MIN to 0."""
    x = np.float32(x)
    maxf = oracle_max_float(iwl, frac)
    minf = np.float32(-maxf)
    sign = 1 if x < 0 else 0
    if x > maxf:
        v = (1 << (iwl + frac)) - 1
    elif x < minf:
        v = -((1 << (iwl + frac)) - 1)
    else:
        scaled = float(np.float32(x) * np.float32(2.0 ** frac))
        if mode == ROUND_DOWN:
            v = int(np.floor(scaled))
        else:
            v = int(np.trunc(scaled))
        # saturating conversion (cvt.rzi.s32.f32)
        v = max(-(2**31), min(2**31 - 1, v))
    if x < 0:
        mag = ((~v + 1) & 0xFFFFFFFF) & 0x7FFFFFFF  # int32 wrap at INT_MIN
    else:
        mag = v & 0x7FFFFFFF
    return sign, mag


def oracle_quant(x, iwl, frac, mode=ROUND_TOWARD_ZERO):
    """float32 fake-quant per CUDA_FLOAT_QUANT."""
    x = np.float32(x)
    if iwl + frac == 0:
        return np.float32(1.0) if x >= 0 else np.float32(-1.0)
    sign, mag = oracle_encode(x, iwl, frac, mode)
    val = np.float32(np.float32(mag) / np.float32(2.0 ** frac))
    return np.float32(-val) if sign else val


def dense_test_values(iwl, frac, n=4001):
    maxf = float(oracle_max_float(iwl, frac))
    lo, hi = -1.5 * maxf - 1.0, 1.5 * maxf + 1.0
    vals = np.linspace(lo, hi, n).astype(np.float32)
    # exact grid points and half-steps, boundary values
    step = 2.0 ** (-frac)
    grid = (np.arange(-(1 << min(iwl + frac, 12)), (1 << min(iwl + frac, 12)) + 1)
            * step).astype(np.float32)
    special = np.array([0.0, -0.0, maxf, -maxf, maxf + step, -(maxf + step),
                        np.float32(step / 3), np.float32(-step / 3)], np.float32)
    return np.concatenate([vals, grid, special])


FORMATS_8BIT = [(iwl, 7 - iwl) for iwl in range(8)]


@pytest.mark.parametrize("iwl,frac", FORMATS_8BIT)
def test_float_quant_matches_oracle_8bit(iwl, frac):
    fmt = QFormat(iwl, frac)
    x = dense_test_values(iwl, frac)
    got = np.asarray(float_quant(jnp.asarray(x), fmt))
    want = np.array([oracle_quant(v, iwl, frac) for v in x], np.float32)
    np.testing.assert_array_equal(got, want)


def test_float_quant_binary():
    fmt = QFormat(0, 0)
    x = jnp.asarray([-2.0, -0.1, -0.0, 0.0, 0.1, 2.0], jnp.float32)
    got = np.asarray(float_quant(x, fmt))
    np.testing.assert_array_equal(got, [-1, -1, 1, 1, 1, 1])


def test_float_quant_truncation_toward_zero():
    # -0.3 at Q5.2: trunc(-1.2) = -1 -> -0.25 (NOT floor which would give -0.5)
    fmt = QFormat(5, 2)
    assert float(float_quant(jnp.float32(-0.3), fmt)) == -0.25
    assert float(float_quant(jnp.float32(0.3), fmt)) == 0.25


def test_float_quant_saturation():
    fmt = QFormat(5, 2)  # max = 31.75
    assert float(fixed_max_float(5, 2)) == 31.75
    assert float(float_quant(jnp.float32(100.0), fmt)) == 31.75
    assert float(float_quant(jnp.float32(-100.0), fmt)) == -31.75


@pytest.mark.parametrize("iwl", [0, 1, 2, 5, 7])
def test_encode_full_width_matches_oracle(iwl):
    """The Hamming attention encodes with frac = 31-iwl
    (lib/layer_cuda.cu:2515)."""
    frac = 31 - iwl
    fmt = QFormat(iwl, frac)
    # inputs on the 8-bit activation grid (what the attention actually sees)
    act = QFormat(iwl, 7 - iwl) if iwl < 8 else QFormat(iwl, 0)
    rng = np.random.default_rng(iwl)
    x = np.asarray(float_quant(
        jnp.asarray(rng.uniform(-40, 40, 512).astype(np.float32)), act))
    # plus arbitrary floats (not on a grid)
    x = np.concatenate([x, rng.uniform(-40, 40, 512).astype(np.float32),
                        np.array([0.0, -0.0, 2.0**iwl, -(2.0**iwl)], np.float32)])
    sign, mag = encode_sign_magnitude(jnp.asarray(x), fmt)
    sign, mag = np.asarray(sign), np.asarray(mag)
    for i, v in enumerate(x):
        s, m = oracle_encode(v, iwl, frac)
        assert sign[i] == s, (v, sign[i], s)
        assert mag[i] == m, (v, iwl, mag[i], m)


@pytest.mark.parametrize("iwl,frac", FORMATS_8BIT[:4])
def test_encode_decode_roundtrip(iwl, frac):
    fmt = QFormat(iwl, frac)
    rng = np.random.default_rng(1)
    x = rng.uniform(-50, 50, 256).astype(np.float32)
    sign, mag = encode_sign_magnitude(jnp.asarray(x), fmt)
    dec = np.asarray(decode_sign_magnitude(sign, mag, fmt))
    want = np.asarray(float_quant(jnp.asarray(x), fmt))
    np.testing.assert_array_equal(dec, want)


def test_fixed_mul_semantics():
    # CUDA_FIXED_MUL: quant(quant(a,fa)*quant(b,fb), fa)
    fa, fb = QFormat(5, 2), QFormat(1, 6)
    a, b = np.float32(1.3), np.float32(0.7)
    qa = oracle_quant(a, 5, 2)       # 1.25
    qb = oracle_quant(b, 1, 6)       # 0.6875
    want = oracle_quant(np.float32(qa * qb), 5, 2)
    got = float(fixed_mul(jnp.float32(a), jnp.float32(b), fa, fb))
    assert got == want


def test_fixed_add_semantics():
    fa = QFormat(2, 5)
    a, b = np.float32(1.37), np.float32(-0.61)
    want = oracle_quant(np.float32(oracle_quant(a, 2, 5) + oracle_quant(b, 2, 5)), 2, 5)
    got = float(fixed_add(jnp.float32(a), jnp.float32(b), fa, fa))
    assert got == want


def test_quantize_ste_gradient_is_identity():
    fmt = QFormat(5, 2)
    g = jax.grad(lambda x: jnp.sum(quantize_ste(x, fmt) * 3.0))(
        jnp.asarray([0.1, -7.3, 100.0], jnp.float32))
    np.testing.assert_array_equal(np.asarray(g), [3.0, 3.0, 3.0])


def test_gray_roundtrip():
    vals = jnp.arange(0, 1 << 10, dtype=jnp.int32)
    g = bin2gray(vals, 0, 10)
    b = gray2bin(g, 0, 10)
    np.testing.assert_array_equal(np.asarray(b), np.asarray(vals))


def test_gray_known_values():
    # standard gray code over low bits: 2 -> 3, 3 -> 2
    assert int(bin2gray(jnp.int32(2), 0, 3)) == 3
    assert int(bin2gray(jnp.int32(3), 0, 3)) == 2


def test_float_quant_blocks_matches_per_block():
    """The fused per-column-block requant is bit-identical to
    concatenated per-block float_quant calls, across mixed formats,
    saturation boundaries, and the iwl+frac==31 INT_MIN wrap edge."""
    from qmann_tpu.numerics import float_quant, float_quant_blocks

    rng = np.random.default_rng(7)
    fmts = (QFormat(5, 2), QFormat(1, 6), QFormat(0, 7), QFormat(0, 31))
    widths = (3, 5, 4, 2)
    # random values spanning well past every block's saturation bound,
    # plus exact boundary magnitudes planted in each block
    x = rng.uniform(-40.0, 40.0, size=(17, sum(widths))).astype(np.float32)
    off = 0
    for fmt, w in zip(fmts, widths):
        maxf = float(fixed_max_float(fmt.iwl, fmt.frac))
        x[0, off] = maxf
        x[1, off] = -maxf
        x[2, off] = maxf + 1.0
        x[3, off] = -maxf - 1.0
        off += w
    # the 31-frac block's wrap edge: scaled == -2^31 exactly
    x[4, -1] = -np.float32(2.0) ** np.int32(-31) * np.float32(2.0 ** 31)

    got = np.asarray(float_quant_blocks(jnp.asarray(x), fmts, widths))
    off = 0
    for fmt, w in zip(fmts, widths):
        want = np.asarray(float_quant(jnp.asarray(x[:, off:off + w]), fmt))
        np.testing.assert_array_equal(got[:, off:off + w], want)
        off += w

    # uniform-format reduction and the mixed-mode / binary fallbacks
    same = (QFormat(5, 2),) * 3
    xs = jnp.asarray(x[:, :9])
    np.testing.assert_array_equal(
        np.asarray(float_quant_blocks(xs, same, (3, 3, 3))),
        np.asarray(float_quant(xs, QFormat(5, 2))))
    mixed = (QFormat(5, 2, mode=1), QFormat(1, 6), QFormat(0, 0))
    got2 = np.asarray(float_quant_blocks(xs, mixed, (3, 3, 3)))
    off = 0
    for fmt, w in zip(mixed, (3, 3, 3)):
        want = np.asarray(float_quant(xs[:, off:off + w], fmt))
        np.testing.assert_array_equal(got2[:, off:off + w], want)
        off += w
