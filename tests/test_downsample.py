"""SSAA final pass: pooling fast path vs general bilinear taps, u8 rounding."""

import jax.numpy as jnp
import numpy as np

from shaderflow_tpu.ops.downsample import final_pass, quantize_u8, ssaa_downsample


def test_quantize_rounds_like_gl():
    x = jnp.array([0.0, 0.5 / 255, 1.5 / 255, 1.0, 1.5, -0.2])
    got = np.asarray(quantize_u8(x))
    np.testing.assert_array_equal(got, [0, 1, 2, 255, 255, 0])


def test_exact_average_pool_2x():
    rng = np.random.default_rng(1)
    render = jnp.asarray(rng.uniform(size=(8, 12, 3)).astype(np.float32))
    out = np.asarray(ssaa_downsample(render, 4, 6, subsample=2))
    expected = np.asarray(render).reshape(4, 2, 6, 2, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_general_path_matches_pool_when_aligned():
    """The general bilinear-tap path must agree with exact pooling when taps
    align with texel centers (the correctness anchor of final.glsl)."""
    rng = np.random.default_rng(2)
    render = jnp.asarray(rng.uniform(size=(16, 16, 3)).astype(np.float32))

    pooled = np.asarray(render).reshape(8, 2, 8, 2, 3).mean(axis=(1, 3))

    # Force general path by asking for components=3 via non-integer-ratio API:
    from shaderflow_tpu.ops.downsample import _output_astuv
    from shaderflow_tpu.ops.sampling import Sampler2D, sample

    tex = Sampler2D(render, linear=True, repeat_x=False, repeat_y=False)
    astuv = _output_astuv(8, 8)
    pixel = jnp.array([1 / 8, 1 / 8], jnp.float32)
    corner = astuv - pixel / 2
    origin = corner + (pixel / 2) / 2
    acc = jnp.zeros((8, 8, 3))
    for x in range(2):
        for y in range(2):
            acc = acc + sample(tex, origin + (pixel / 2) * jnp.array([x, y], jnp.float32))
    general = np.asarray(acc / 4)
    np.testing.assert_allclose(general, pooled, atol=1e-5)


def test_general_path_collapsed_taps_match_explicit_loop():
    """The general path collapses the subsample^2 bilinear taps into one
    separable resample with tap-averaged band matrices (linearity). It must
    match the explicit tap loop it replaced on a FRACTIONAL ratio (the
    regime neither fast path covers), for down- and up-scaling."""
    from shaderflow_tpu.ops.sampling import Sampler2D, sample_separable

    rng = np.random.default_rng(11)
    render = jnp.asarray(rng.random((15, 21, 3), np.float32))

    for oh, ow, s in [(8, 9, 2), (8, 9, 3), (20, 30, 2)]:
        got = np.asarray(ssaa_downsample(render, oh, ow, subsample=s))

        tex = Sampler2D(render, linear=True, repeat_x=False, repeat_y=False)
        u = (jnp.arange(ow, dtype=jnp.float32) + 0.5) / ow
        v = 1.0 - (jnp.arange(oh, dtype=jnp.float32) + 0.5) / oh
        acc = jnp.zeros((oh, ow, 3), jnp.float32)
        for x in range(s):
            for y in range(s):
                du = -1.0 / ow / 2 + (1.0 / ow / s) * (0.5 + x)
                dv = -1.0 / oh / 2 + (1.0 / oh / s) * (0.5 + y)
                acc = acc + sample_separable(tex, u + du, v + dv)
        expected = np.asarray(acc / (s * s))

        np.testing.assert_allclose(got, expected, atol=2e-6,
                                   err_msg=f"{oh}x{ow} s={s}")


def test_identity_when_same_resolution():
    render = jnp.asarray(np.random.default_rng(3).uniform(size=(6, 6, 3)).astype(np.float32))
    out = np.asarray(ssaa_downsample(render, 6, 6, subsample=1))
    np.testing.assert_allclose(out, np.asarray(render), atol=1e-6)


def test_final_pass_u8():
    render = jnp.ones((8, 8, 4), jnp.float32) * 0.5
    out = np.asarray(final_pass(render, 4, 4, subsample=2))
    assert out.shape == (4, 4, 3)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, np.full((4, 4, 3), 128))


def test_equal_resolution_stencil_matches_general_taps():
    """The equal-res fast path (separable 3-tap stencil) must equal the
    general subsample^2 bilinear-tap average it replaces."""
    import numpy as np
    import jax.numpy as jnp
    from shaderflow_tpu.ops.downsample import ssaa_downsample
    from shaderflow_tpu.ops.sampling import Sampler2D, sample_separable

    rng = np.random.default_rng(7)
    h, w = 24, 32
    image = jnp.asarray(rng.random((h, w, 3), np.float32))

    for subsample in (2, 3):
        got = ssaa_downsample(image, h, w, subsample=subsample)

        tex = Sampler2D(image, linear=True, repeat_x=False, repeat_y=False)
        u = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        v = 1.0 - (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        acc = jnp.zeros((h, w, 3), jnp.float32)
        for x in range(subsample):
            for y in range(subsample):
                du = -1.0 / w / 2 + (1.0 / w / subsample) * (0.5 + x)
                dv = -1.0 / h / 2 + (1.0 / h / subsample) * (0.5 + y)
                acc = acc + sample_separable(tex, u + du, v + dv)
        expected = acc / (subsample * subsample)

        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   atol=2e-6, err_msg=f"subsample={subsample}")
