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


def test_blocked_resample_matches_dense_band_matmul():
    """resample_separable_blocked (the banded general-path engine) must
    equal the dense tap-averaged band matmuls it replaces — both when the
    windows genuinely engage (in_block < n) and on the dense fallback."""
    import numpy as np
    import jax.numpy as jnp
    from shaderflow_tpu.ops.sampling import resample_separable_blocked

    rng = np.random.default_rng(11)

    def dense(data, pos_rows, pos_cols):
        h, w = data.shape[0], data.shape[1]
        tr = jnp.arange(h, dtype=jnp.float32)
        tc = jnp.arange(w, dtype=jnp.float32)
        pr = jnp.clip(pos_rows, 0.0, h - 1.0)
        pc = jnp.clip(pos_cols, 0.0, w - 1.0)
        w_rows = jnp.maximum(1.0 - jnp.abs(pr[:, :, None] - tr), 0.0).mean(0)
        w_cols = jnp.maximum(1.0 - jnp.abs(pc[:, :, None] - tc), 0.0).mean(0)
        rows = jnp.einsum("oh,hwc->owc", w_rows, data)
        return jnp.einsum("pw,owc->opc", w_cols, rows)

    # Upsample 2x (texels/px = 0.5): blocked windows engage (128 << 512)
    data = jnp.asarray(rng.random((512, 512, 3), np.float32))
    out_h = out_w = 1024
    taps = 2
    pos_r = jnp.stack([(jnp.arange(out_h) + 0.5) / out_h * 512 - 0.5 + k * 0.2
                       for k in range(taps)])
    pos_c = jnp.stack([(jnp.arange(out_w) + 0.5) / out_w * 512 - 0.5 + k * 0.2
                       for k in range(taps)])
    got = resample_separable_blocked(data, pos_r, pos_c, 0.5 + 0.2, 0.5 + 0.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(dense(data, pos_r, pos_c)),
                               atol=3e-6)

    # Minification with a small block: windows engage on the downsample side
    out_h = out_w = 128
    pos_r = ((jnp.arange(out_h) + 0.5) / out_h * 512 - 0.5)[None]
    pos_c = ((jnp.arange(out_w) + 0.5) / out_w * 512 - 0.5)[None]
    got = resample_separable_blocked(data, pos_r, pos_c, 4.0, 4.0, block=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(dense(data, pos_r, pos_c)),
                               atol=3e-6)


def test_fractional_ssaa_path_unchanged_output():
    """ssaa<1 (render below output res) goes through the blocked general
    path; pin its output against a literal per-tap bilinear reference."""
    import numpy as np
    import jax.numpy as jnp
    from shaderflow_tpu.ops.downsample import ssaa_downsample
    from shaderflow_tpu.ops.sampling import Sampler2D, sample_separable

    rng = np.random.default_rng(3)
    rh, rw = 36, 48      # render res (ssaa=0.75 of 48x64)
    oh, ow = 48, 64
    image = jnp.asarray(rng.random((rh, rw, 3), np.float32))
    subsample = 2
    got = ssaa_downsample(image, oh, ow, subsample=subsample)

    tex = Sampler2D(image, linear=True, repeat_x=False, repeat_y=False)
    u = (jnp.arange(ow, dtype=jnp.float32) + 0.5) / ow
    v = 1.0 - (jnp.arange(oh, dtype=jnp.float32) + 0.5) / oh
    acc = jnp.zeros((oh, ow, 3), jnp.float32)
    for x in range(subsample):
        for y in range(subsample):
            du = -1.0 / ow / 2 + (1.0 / ow / subsample) * (0.5 + x)
            dv = -1.0 / oh / 2 + (1.0 / oh / subsample) * (0.5 + y)
            acc = acc + sample_separable(tex, u + du, v + dv)
    expected = acc / (subsample * subsample)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=3e-6)
