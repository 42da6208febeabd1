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


def stripes(n, period, c=3):
    """Vertical stripes: vary along x with the given texel period."""
    xx = np.arange(n)
    val = ((xx // (period // 2)) % 2).astype(np.float32)
    img = np.broadcast_to(val[None, :, None], (n, n, c))
    return np.ascontiguousarray(img)


def _oblique_uv(out=64, tex=512):
    """uv field minifying 8x along v but 1:1 along u — an anisotropic
    footprint (major axis = v). u spans only out/tex of the texture."""
    u = (np.arange(out) + 0.5) / tex
    v = (np.arange(out) + 0.5) / out
    return jnp.asarray(np.stack(np.meshgrid(u, v), -1), jnp.float32)


def test_aniso_preserves_minor_axis_detail():
    """Oblique minification (8x along v, 1x along u) over vertical stripes:
    isotropic trilinear picks LOD from the MAJOR footprint (3) and washes
    the stripes to flat grey; anisotropic taps spread along v keep them.
    This is exactly the sharpness the reference's GL x16 sampler state buys
    (/root/reference/shaderflow/texture.py:110-137)."""
    data = jnp.asarray(stripes(512, 8))
    iso = mip_pyramid(Sampler2D(data, repeat_x=False, repeat_y=False))
    aniso = mip_pyramid(Sampler2D(data, repeat_x=False, repeat_y=False),
                        anisotropy=8)
    assert iso.aniso == 1 and aniso.aniso == 8
    uv = _oblique_uv()
    out_iso = np.asarray(sample_mip(iso, uv))
    out_aniso = np.asarray(sample_mip(aniso, uv))
    # (a) anisotropy= changes the output on an oblique-minification case
    assert float(np.abs(out_iso - out_aniso).max()) > 0.2
    # (b) and preserves the along-u stripe contrast the isotropic path loses
    # entirely (period-8 stripes vanish at the major-axis LOD's level 3)
    contrast_iso = out_iso[:, :, 0].std(axis=1).mean()
    contrast_aniso = out_aniso[:, :, 0].std(axis=1).mean()
    assert contrast_iso < 0.05
    assert contrast_aniso > 0.3  # stripes actually visible, not just "less flat"


def test_aniso_isotropic_footprint_matches_trilinear():
    """ratio clamps to 1 on an isotropic footprint -> zero tap spread: the
    aniso sampler degenerates to plain trilinear (no gratuitous blur)."""
    data = jnp.asarray(checker(128))
    iso = mip_pyramid(Sampler2D(data))
    aniso = mip_pyramid(Sampler2D(data), anisotropy=8)
    u = (np.arange(32) + 0.5) / 32
    uv = jnp.asarray(np.stack(np.meshgrid(u, u), -1), jnp.float32)
    np.testing.assert_allclose(np.asarray(sample_mip(iso, uv)),
                               np.asarray(sample_mip(aniso, uv)),
                               atol=2e-5)


def test_aniso_pytree_roundtrip():
    import jax
    mip = mip_pyramid(Sampler2D(jnp.zeros((16, 16, 3))), anisotropy=4)
    leaves, treedef = jax.tree_util.tree_flatten(mip)
    back = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(back, MipSampler) and back.aniso == 4


def test_anisotropy_without_mipmaps_warns(caplog):
    """Explicit anisotropy on a mipless texture is the one unimplementable
    combination (no pyramid to filter against) — it must warn; the default
    (x16, like the reference) on a mipless texture must NOT."""
    import logging
    from shaderflow_tpu.scene import ShaderScene
    from shaderflow_tpu.texture import ShaderTexture

    class Empty(ShaderScene):
        def build(self):
            pass

    scene = Empty()
    with caplog.at_level(logging.WARNING, logger="shaderflow_tpu"):
        ShaderTexture(scene=scene, name="iAniso", anisotropy=8)
    assert any("anisotropic filtering needs the mip pyramid" in r.message
               for r in caplog.records)
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="shaderflow_tpu"):
        ShaderTexture(scene=scene, name="iDefault")           # default x16
        ShaderTexture(scene=scene, name="iOff", anisotropy=1)  # explicit off
        ShaderTexture(scene=scene, name="iMip", anisotropy=8, mipmaps=True)
    assert not any("anisotropic" in r.message for r in caplog.records)


def test_frag_tex_aniso_explicit_opt_in():
    """Frag.tex engages anisotropic sampling only on an explicit
    anisotropy= request: GL's default x16 is free sampler state, ours is
    taps x levels real samples — default mipmapped textures stay trilinear."""
    from shaderflow_tpu.scene import ShaderScene
    from shaderflow_tpu.texture import ShaderTexture

    seen = {}

    class Scene(ShaderScene):
        def build(self):
            ShaderTexture(scene=self, name="iPlain", width=32, height=32,
                          components=3, mipmaps=True).from_numpy(checker(32))
            ShaderTexture(scene=self, name="iSharp", width=32, height=32,
                          components=3, mipmaps=True,
                          anisotropy=8).from_numpy(checker(32))

            def frag(sf):
                seen["plain"] = sf.tex("iPlain").aniso
                seen["sharp"] = sf.tex("iSharp").aniso
                return ops.vec4(sf.astuv[..., 0], 0.0, 0.0, 1.0)
            self.shader.fragment = frag

    Scene().main(width=8, height=8, fps=10, time=0.1, output="null")
    assert seen == {"plain": 1, "sharp": 8}
