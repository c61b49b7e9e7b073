import numpy as np
import jax.numpy as jnp

from vnlb_tpu.ops.agg import agg_patches, finalize


def numpy_agg(shape, patches, inds, valid, pt, ps):
    """Scalar oracle of the scatter-add (reference agg/comp_agg.py:106-141)."""
    t, c, h, w = shape
    deno = np.zeros((t, c, h, w), np.float64)
    weights = np.zeros((t, h, w), np.float64)
    chw, hw = c * h * w, h * w
    b, k = inds.shape
    for bi in range(b):
        for ki in range(k):
            if not valid[bi, ki] or inds[bi, ki] < 0:
                continue
            ind = inds[bi, ki]
            t0, y0, x0 = ind // chw, (ind % hw) // w, ind % w
            for dt in range(pt):
                for dy in range(ps):
                    for dx in range(ps):
                        deno[t0 + dt, :, y0 + dy, x0 + dx] += \
                            patches[bi, ki, dt, :, dy, dx]
                        weights[t0 + dt, y0 + dy, x0 + dx] += 1
    return deno, weights


def test_agg_matches_numpy():
    rng = np.random.default_rng(11)
    shape = (3, 3, 20, 22)
    t, c, h, w = shape
    pt, ps = 2, 5
    b, k = 4, 6
    chw = c * h * w
    ts = rng.integers(0, t - pt + 1, (b, k))
    ys = rng.integers(0, h - ps + 1, (b, k))
    xs = rng.integers(0, w - ps + 1, (b, k))
    inds = (ts * chw + ys * w + xs).astype(np.int32)
    inds[0, 0] = -1  # invalid entry
    valid = np.ones((b, k), bool)
    valid[1, 2] = False
    patches = rng.normal(0, 1, (b, k, pt, c, ps, ps)).astype(np.float32)

    deno0 = jnp.zeros((t * h * w, c), jnp.float32)
    wts0 = jnp.zeros((t * h * w,), jnp.float32)
    deno, wts = agg_patches(deno0, wts0, jnp.asarray(patches),
                            jnp.asarray(inds), jnp.asarray(valid),
                            pt, ps, shape)
    want_d, want_w = numpy_agg(shape, patches, inds, valid, pt, ps)
    got_d = np.asarray(deno).reshape(t, h, w, c).transpose(0, 3, 1, 2)
    got_w = np.asarray(wts).reshape(t, h, w)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_w, want_w, rtol=1e-6)


def test_finalize_fallback():
    shape = (1, 3, 4, 4)
    t, c, h, w = shape
    deno = np.zeros((t * h * w, c), np.float32)
    wts = np.zeros((t * h * w,), np.float32)
    deno[5] = [2.0, 4.0, 6.0]
    wts[5] = 2.0
    fallback = np.full((t, c, h, w), 7.0, np.float32)
    out = np.asarray(finalize(jnp.asarray(deno), jnp.asarray(wts),
                              jnp.asarray(fallback), shape))
    y, x = 5 // w, 5 % w
    np.testing.assert_allclose(out[0, :, y, x], [1.0, 2.0, 3.0])
    mask = np.ones((h, w), bool)
    mask[y, x] = False
    assert np.all(out[0][:, mask] == 7.0)


def test_agg_deterministic():
    rng = np.random.default_rng(12)
    shape = (2, 3, 16, 16)
    t, c, h, w = shape
    pt, ps = 2, 7
    inds = (rng.integers(0, t - pt + 1, (8, 10)) * (c * h * w)
            + rng.integers(0, h - ps + 1, (8, 10)) * w
            + rng.integers(0, w - ps + 1, (8, 10))).astype(np.int32)
    patches = rng.normal(0, 1, (8, 10, pt, c, ps, ps)).astype(np.float32)
    valid = np.ones((8, 10), bool)
    deno0 = jnp.zeros((t * h * w, c), jnp.float32)
    wts0 = jnp.zeros((t * h * w,), jnp.float32)
    a1, w1 = agg_patches(deno0, wts0, jnp.asarray(patches), jnp.asarray(inds),
                         jnp.asarray(valid), pt, ps, shape)
    a2, w2 = agg_patches(deno0, wts0, jnp.asarray(patches), jnp.asarray(inds),
                         jnp.asarray(valid), pt, ps, shape)
    assert np.array_equal(np.asarray(a1), np.asarray(a2))
    assert np.array_equal(np.asarray(w1), np.asarray(w2))


def test_im2col_conv_bitwise_parity():
    """The one-hot-conv unfold must equal gather.im2col BITWISE (each
    output element has exactly one nonzero kernel term; bf16 products x*1
    are exact, and the f32 path's HIGHEST-precision split recombines
    losslessly for a 0/1 multiplier)."""
    from vnlb_tpu.ops import gather

    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.normal(128, 40, (2, 3, 24, 20)).astype(np.float32))
    for bf16 in (True, False):
        ref = gather.im2col(v, 7).astype(
            jnp.bfloat16 if bf16 else jnp.float32)
        got = gather.im2col_conv(v, 7, bf16=bf16)
        assert got.shape == ref.shape
        assert np.array_equal(np.asarray(ref, np.float32),
                              np.asarray(got, np.float32))


def test_cols_fuse_pt_cmaj_order():
    """c-major fused rows are the (c, pt, ps*ps) permutation of the
    pt-major fusion (same data, per-channel contiguous p-lane blocks)."""
    from vnlb_tpu.ops import gather

    rng = np.random.default_rng(4)
    c, ps, pt, hpwp = 3, 2, 2, 5
    d = c * ps * ps
    cols = jnp.asarray(rng.normal(0, 1, (2 * hpwp, d)).astype(np.float32))
    ptm = np.asarray(gather.cols_fuse_pt(cols, pt, hpwp))       # (N, pt*d)
    cmj = np.asarray(gather.cols_fuse_pt(cols, pt, hpwp, c=c))
    pp = ps * ps
    ptm6 = ptm.reshape(-1, pt, c, pp)
    cmj6 = cmj.reshape(-1, c, pt, pp)
    assert np.array_equal(ptm6.transpose(0, 2, 1, 3), cmj6)
