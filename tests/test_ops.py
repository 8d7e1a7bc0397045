"""Pooling / unpooling / resize op tests (torch as independent oracle)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esn_tpu import ops


def test_max_pool_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.randn(2, 5, 12, 14).astype(np.float32)
    ref = torch.nn.functional.max_pool2d(torch.from_numpy(x), 2, 2).numpy()
    y = ops.max_pool2d(jnp.asarray(x.transpose(0, 2, 3, 1)), 2, 2)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref)


def test_max_pool_indices_unpool_roundtrip_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.randn(2, 3, 16, 20).astype(np.float32)
    xt = torch.from_numpy(x)
    vals_t, idx_t = torch.nn.functional.max_pool2d(xt, 2, 2, return_indices=True)
    unpooled_t = torch.nn.functional.max_unpool2d(vals_t, idx_t, 2, 2).numpy()

    xn = jnp.asarray(x.transpose(0, 2, 3, 1))
    vals, idx = ops.max_pool2d_with_indices_2x2(xn)
    np.testing.assert_allclose(np.asarray(vals).transpose(0, 3, 1, 2),
                               vals_t.numpy())
    out = ops.max_unpool2d_2x2(vals, idx)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               unpooled_t)


def test_max_unpool_output_size_pad():
    x = jnp.arange(2 * 10 * 10 * 3, dtype=jnp.float32).reshape(2, 10, 10, 3)
    vals, idx = ops.max_pool2d_with_indices_2x2(x)
    out = ops.max_unpool2d_2x2(vals, idx, output_size=(11, 11))
    assert out.shape == (2, 11, 11, 3)
    assert float(jnp.sum(jnp.abs(out[:, 10, :, :]))) == 0.0


def test_unpool_grad_flows():
    x = jnp.ones((1, 4, 4, 2))

    def f(x):
        v, i = ops.max_pool2d_with_indices_2x2(x)
        return jnp.sum(ops.max_unpool2d_2x2(v * 2.0, i))

    g = jax.grad(f)(x)
    assert np.all(np.isfinite(np.asarray(g)))
    # one position per 2x2 window gets gradient 2: 2x2 windows x 2 channels
    assert float(jnp.sum(g)) == pytest.approx(2.0 * 2 * 2 * 2)


def test_avg_pool_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.randn(1, 4, 9, 9).astype(np.float32)
    for (k, s, p) in [(3, 2, 1), (2, 2, 0), (3, 1, 1)]:
        ref = torch.nn.functional.avg_pool2d(torch.from_numpy(x), k, s, p).numpy()
        y = ops.avg_pool2d(jnp.asarray(x.transpose(0, 2, 3, 1)), k, s, p)
        np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref,
                                   rtol=1e-5, atol=1e-6)


def test_adaptive_avg_pool_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.randn(2, 5, 13, 17).astype(np.float32)
    for out_size in [1, 2, 3, 6]:
        ref = torch.nn.functional.adaptive_avg_pool2d(
            torch.from_numpy(x), out_size).numpy()
        y = ops.adaptive_avg_pool2d(jnp.asarray(x.transpose(0, 2, 3, 1)),
                                    out_size)
        np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref,
                                   rtol=1e-4, atol=1e-5)


def test_resize_bilinear_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.randn(2, 4, 8, 12).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(17, 33), mode="bilinear",
        align_corners=False).numpy()
    y = ops.resize_bilinear(jnp.asarray(x.transpose(0, 2, 3, 1)), (17, 33))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("size", [(4, 8), (3, 13), (4, 48)])
def test_resize_bilinear_downsample_matches_torch(rng, size):
    """DOWNSCALE parity (r4): torch/cv2 keep the 2-tap kernel when
    minifying; jax.image.resize antialiases unless told not to — the
    ContextNet deep branch and the s<1 augment scales hit this path."""
    torch = pytest.importorskip("torch")
    x = rng.randn(2, 3, 16, 32).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=size, mode="bilinear",
        align_corners=False).numpy()
    y = ops.resize_bilinear(jnp.asarray(x.transpose(0, 2, 3, 1)), size)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


def test_conv2d_custom_weight_grad_matches_native(rng):
    """The hand-written dW (K*K strided einsums) == XLA's native conv grad."""
    from esn_tpu.ops.convolution import conv2d, _conv_raw
    for (k, s, p, d, g, ci, co) in [
            ((3, 3), 1, 1, 1, 1, 6, 8),
            ((3, 3), 2, 1, 1, 1, 6, 8),
            ((3, 1), 1, (1, 0), 1, 1, 5, 7),
            ((3, 3), 1, 2, 2, 1, 4, 4),      # dilated
            ((3, 3), 2, 2, 2, 1, 4, 4),      # dilated + strided
            ((5, 5), 2, 2, 1, 1, 3, 8),
            ((3, 3), 1, 1, 1, 4, 8, 8),      # grouped (native path)
    ]:
        x = jnp.asarray(rng.randn(2, 12, 14, ci), jnp.float32)
        kh, kw = k if isinstance(k, tuple) else (k, k)
        w = jnp.asarray(rng.randn(kh, kw, ci // g, co) * 0.2, jnp.float32)

        def loss_custom(w_):
            return jnp.sum(conv2d(x, w_, stride=s, padding=p, dilation=d,
                                  groups=g) ** 2)

        def loss_native(w_):
            from esn_tpu.ops.convolution import _pair
            return jnp.sum(_conv_raw(
                x, w_, _pair(s),
                tuple((pp, pp) for pp in _pair(p)), _pair(d), g) ** 2)

        gc = jax.grad(loss_custom)(w)
        gn = jax.grad(loss_native)(w)
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gn),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"k={k} s={s} p={p} d={d} g={g}")
        # dx parity too
        gx_c = jax.grad(lambda x_: jnp.sum(conv2d(
            x_, w, stride=s, padding=p, dilation=d, groups=g) ** 2))(x)
        from esn_tpu.ops.convolution import _pair
        gx_n = jax.grad(lambda x_: jnp.sum(_conv_raw(
            x_, w, _pair(s), tuple((pp, pp) for pp in _pair(p)),
            _pair(d), g) ** 2))(x)
        np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_n),
                                   rtol=2e-4, atol=2e-4)


def test_argmax_lastdim_matches_jnp(rng):
    from esn_tpu.ops import argmax_lastdim
    x = jnp.asarray(rng.randn(3, 5, 7, 19), jnp.float32)
    np.testing.assert_array_equal(np.asarray(argmax_lastdim(x)),
                                  np.argmax(np.asarray(x), -1))
    # ties resolve to the FIRST max, like jnp.argmax
    t = jnp.asarray([[1.0, 3.0, 3.0, 0.0], [2.0, 2.0, 1.0, 2.0]])
    np.testing.assert_array_equal(np.asarray(argmax_lastdim(t)), [1, 0])
    # bf16 input
    xb = x.astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(argmax_lastdim(xb)),
                                  np.argmax(np.asarray(xb, np.float32), -1))


def test_argmax_lastdim_packed_edge_cases(rng):
    """The packed/two-pass lowerings must be bit-exact vs jnp.argmax,
    including full-row ties, signed zeros, and bf16 rounding ties."""
    from esn_tpu.ops import argmax_lastdim
    x = rng.randn(4, 7, 9, 19).astype(np.float32)
    x[..., ::3] = 0.0
    x[0, 0, 0, :] = 0.25
    x[1, 2, 3, 4] = -0.0
    x[1, 2, 3, 5] = 0.0
    x[2, 1, 1, :] = np.arange(19) * 1e-8   # collapses to ties in bf16
    x[3, 0, 0, :] = -np.arange(19) - 5.0   # all-negative row
    for dt in (jnp.float32, jnp.bfloat16):
        xx = jnp.asarray(x).astype(dt)
        np.testing.assert_array_equal(np.asarray(argmax_lastdim(xx)),
                                      np.asarray(jnp.argmax(xx, -1)))


def test_conv_transpose_subpixel_matches_zero_insert(rng, monkeypatch):
    """The subpixel lowering (default) and the zero-insert fallback must
    agree exactly, values and gradients, on the zoo's decoder geometries."""
    from esn_tpu.ops import convolution as C
    for (k, s, p, op) in [(2, 2, 0, 0), (3, 2, 1, 1), (4, 2, 1, 0)]:
        x = jnp.asarray(rng.randn(2, 9, 11, 8), jnp.float32)
        w = jnp.asarray(rng.randn(k, k, 8, 5), jnp.float32)
        b = jnp.asarray(rng.randn(5), jnp.float32)

        def f(x_, w_, b_, use_subpixel):
            monkeypatch.setenv("ESN_TPU_SUBPIXEL_CONVT",
                               "1" if use_subpixel else "0")
            return C.conv2d_transpose(x_, w_, stride=s, padding=p,
                                      output_padding=op, bias=b_)

        ref = f(x, w, b, False)
        got = f(x, w, b, True)
        assert ref.shape == got.shape, (k, s, p, op)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

        def loss(args, use):
            return jnp.sum(f(*args, use) ** 2)

        gref = jax.grad(loss)((x, w, b), False)
        ggot = jax.grad(loss)((x, w, b), True)
        for a, c in zip(gref, ggot):
            np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                       rtol=1e-4, atol=1e-4)
