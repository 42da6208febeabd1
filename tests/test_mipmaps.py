"""Mipmap pyramid + trilinear LOD sampling (ops/sampling.py MipSampler),
and the texture(mipmaps=True) wiring through Frag.tex.

Role parity: /root/reference/shaderflow/texture.py:82-137 delegates pyramid
build + level selection to the GL driver; here the pyramid is built in-jit
and LOD comes from the uv field's finite differences.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from shaderflow_tpu import ops
from shaderflow_tpu.ops.sampling import MipSampler, Sampler2D, auto_lod, mip_pyramid, sample_mip


def checker(n, c=3):
    yy, xx = np.mgrid[:n, :n]
    val = ((xx + yy) % 2).astype(np.float32)
    return np.repeat(val[..., None], c, axis=2)


def test_pyramid_shapes_and_means():
    tex = Sampler2D(jnp.asarray(checker(64)))
    mip = mip_pyramid(tex)
    sizes = [(l.height, l.width) for l in mip.levels]
    assert sizes[0] == (64, 64) and sizes[-1] == (1, 1)
    assert len(mip.levels) == 7
    # Box-filter invariant: every level preserves the mean (0.5 checker)
    for level in mip.levels:
        assert abs(float(level.data.mean()) - 0.5) < 1e-6


def test_pyramid_npot_floors():
    tex = Sampler2D(jnp.zeros((7, 5, 3)))
    mip = mip_pyramid(tex)
    assert [(l.height, l.width) for l in mip.levels][:3] == [(7, 5), (3, 2), (1, 1)]


def test_minification_uses_deep_level():
    """Sampling a 1-px checker at 1/16 scale: bilinear at level 0 aliases
    (values swing 0/1); the mip path returns the 0.5 average."""
    mip = mip_pyramid(Sampler2D(jnp.asarray(checker(128))))
    # A 8x8 output grid over the whole texture: footprint = 16 texels.
    # Samples land ON texel centers (u*128-0.5 = 16k), which all share one
    # checker parity — the classic aliased all-one-color result.
    u = np.arange(8) / 8 + 0.5 / 128
    uv = jnp.asarray(np.stack(np.meshgrid(u, u), -1), jnp.float32)
    aliased = ops.sample(mip.base, uv)
    filtered = sample_mip(mip, uv)
    assert float(jnp.abs(aliased - 0.5).max()) > 0.4      # aliasing visible
    assert float(jnp.abs(filtered - 0.5).max()) < 0.1     # mip averages it away


def test_auto_lod_matches_scale():
    h = w = 256
    # Output 32x32 covering the full texture -> footprint 8 -> lod 3
    u = (np.arange(32) + 0.5) / 32
    uv = jnp.asarray(np.stack(np.meshgrid(u, u), -1), jnp.float32)
    lod = auto_lod(uv, h, w)
    assert abs(float(lod.mean()) - 3.0) < 0.1
    # Magnification clamps at 0
    u2 = (np.arange(64) + 0.5) / 64 * 0.1
    uv2 = jnp.asarray(np.stack(np.meshgrid(u2, u2), -1), jnp.float32)
    assert float(auto_lod(uv2, h, w).max()) == 0.0


def test_static_lod_two_level_matches_weighted():
    mip = mip_pyramid(Sampler2D(jnp.asarray(np.random.default_rng(0)
                                            .random((32, 32, 3), np.float32))))
    u = (np.arange(16) + 0.5) / 16
    uv = jnp.asarray(np.stack(np.meshgrid(u, u), -1), jnp.float32)
    a = sample_mip(mip, uv, lod=1.5)                       # static: 2 levels
    b = sample_mip(mip, uv, lod=jnp.float32(1.5))          # traced: hat weights
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_frag_tex_returns_mipsampler_and_scene_renders():
    from shaderflow_tpu.scene import ShaderScene
    from shaderflow_tpu.texture import ShaderTexture

    seen = {}

    class Mipped(ShaderScene):
        def build(self):
            tex = ShaderTexture(scene=self, name="iDetail", width=128,
                                height=128, components=3, mipmaps=True)
            tex.from_numpy(checker(128))

            def frag(sf):
                sampler = sf.tex("iDetail")
                seen["type"] = type(sampler).__name__
                # zoomed-out sampling: the whole texture in view
                rgb = sf.stexture(sampler, sf.astuv)
                return ops.vec4(rgb[..., 0], rgb[..., 1], rgb[..., 2], 1.0)
            self.shader.fragment = frag

    import tempfile
    from pathlib import Path
    with tempfile.TemporaryDirectory() as tmp:
        out = Path(tmp) / "o.rgb"
        Mipped().main(width=16, height=16, fps=10, time=0.1, output=str(out))
        frames = np.fromfile(out, np.uint8).reshape(-1, 16, 16, 3)
    assert seen["type"] == "MipSampler"
    # 8-texel footprint -> deep level -> near-uniform 0.5 grey, no aliasing
    assert abs(frames[0].astype(np.float32).mean() / 255 - 0.5) < 0.05
    assert frames[0].astype(np.float32).std() / 255 < 0.1


def test_anisotropy_warns(caplog):
    import logging
    from shaderflow_tpu.scene import ShaderScene
    from shaderflow_tpu.texture import ShaderTexture

    class Empty(ShaderScene):
        def build(self):
            pass

    with caplog.at_level(logging.WARNING, logger="shaderflow_tpu"):
        ShaderTexture(scene=Empty(), name="iAniso", anisotropy=8)
    assert any("anisotropic filtering is not implemented" in r.message
               for r in caplog.records)
