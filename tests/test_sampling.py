"""Texture sampling: GL semantics (texel centers, wrap modes, bilinear)."""

import jax.numpy as jnp
import numpy as np

from shaderflow_tpu.ops import Sampler2D, gtexture, sample, stexture, texel_fetch
from shaderflow_tpu.ops.stdlib import vec2


def checker(h, w):
    data = np.indices((h, w)).sum(axis=0) % 2
    return jnp.asarray(data[..., None].astype(np.float32))


def test_nearest_texel_centers():
    # 2x2 texture: rows top-down [[a, b], [c, d]]
    data = jnp.asarray(np.array([[[1.0], [2.0]], [[3.0], [4.0]]], np.float32))
    tex = Sampler2D(data, linear=False)
    # v=0.75 is the upper half -> row 0; u=0.25 left col
    assert float(sample(tex, vec2(0.25, 0.75))[0]) == 1.0
    assert float(sample(tex, vec2(0.75, 0.75))[0]) == 2.0
    assert float(sample(tex, vec2(0.25, 0.25))[0]) == 3.0
    assert float(sample(tex, vec2(0.75, 0.25))[0]) == 4.0


def test_bilinear_center_blend():
    data = jnp.asarray(np.array([[[0.0], [1.0]]], np.float32))  # 1x2
    tex = Sampler2D(data, linear=True, repeat_x=False, repeat_y=False)
    assert float(sample(tex, vec2(0.5, 0.5))[0]) == 0.5
    # At texel centers: exact values
    assert float(sample(tex, vec2(0.25, 0.5))[0]) == 0.0
    assert float(sample(tex, vec2(0.75, 0.5))[0]) == 1.0


def test_repeat_vs_clamp():
    data = jnp.asarray(np.array([[[0.0], [1.0]]], np.float32))
    repeat = Sampler2D(data, linear=False, repeat_x=True)
    clamp = Sampler2D(data, linear=False, repeat_x=False)
    # u=1.25 wraps to u=0.25 -> texel 0; clamp stays at right texel
    assert float(sample(repeat, vec2(1.25, 0.5))[0]) == 0.0
    assert float(sample(clamp, vec2(1.25, 0.5))[0]) == 1.0


def test_bilinear_repeat_wraps_across_edge():
    data = jnp.asarray(np.array([[[0.0], [1.0]]], np.float32))
    tex = Sampler2D(data, linear=True, repeat_x=True)
    # u=0 is halfway between texel -1 (wraps to 1.0) and texel 0 (0.0)
    assert float(sample(tex, vec2(0.0, 0.5))[0]) == 0.5


def test_texel_fetch_bounds():
    data = checker(4, 4)
    tex = Sampler2D(data, linear=False)
    # y is GL bottom-up: y=0 is the bottom row = array row 3
    got = texel_fetch(tex, jnp.array([0, 0]))
    assert float(got[0]) == float(data[3, 0, 0])
    # Out of bounds -> 0
    assert float(texel_fetch(tex, jnp.array([-1, 0]))[0]) == 0.0
    assert float(texel_fetch(tex, jnp.array([4, 0]))[0]) == 0.0


def test_gtexture_aspect_scaling():
    # A wide 1x2 texture sampled by gtexture scales gluv.x by h/w
    data = jnp.asarray(np.array([[[0.0], [1.0]]], np.float32))
    tex = Sampler2D(data, linear=False)
    # gluv=(0,0) is the center
    assert float(gtexture(tex, vec2(0.0, 0.0))[0]) in (0.0, 1.0)
    # stexture(stuv) == gtexture(2*stuv - 1)
    a = stexture(tex, vec2(0.3, 0.5))
    b = gtexture(tex, vec2(-0.4, 0.0))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_grid_sampling_shapes():
    tex = Sampler2D(checker(8, 8), linear=True)
    uv = jnp.stack(jnp.meshgrid(jnp.linspace(0, 1, 16), jnp.linspace(0, 1, 12), indexing="xy"), -1)
    out = sample(tex, uv)
    assert out.shape == (12, 16, 1)
