"""GLSL fragment front-end (shaderflow_tpu/glsl.py).

The reference's authoring format is GLSL `.frag` sources assembled by a
metaprogrammer and handed to OpenGL (/root/reference/shaderflow/shader.py:
186-239); here the same sources compile to a masked, vectorized jnp program.

Two layers of coverage:
  - unit tests drive the interpreter against a synthetic Frag context and
    assert against literal numpy transcriptions of the GLSL semantics
    (divergent control flow, swizzle stores, arrays, user functions);
  - parity tests render the reference's own example fragments (read from
    /root/reference at test time when present, never copied into the repo)
    side by side with this repo's python fragments of the same scenes and
    assert PSNR.
"""

import tempfile
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from shaderflow_tpu import glsl
from shaderflow_tpu.glsl import GlslError, compile_fragment, looks_like_glsl
from shaderflow_tpu.shader import Frag, finish_coords, make_coords, missing_fragment

W, H = 8, 4


class _Meta:
    linear = True
    repeat_x = True
    repeat_y = True
    mipmaps = False


class _NearestMeta(_Meta):
    linear = False


def make_sf(width=W, height=H, uniforms=None, statics=None, textures=None,
            texture_meta=None):
    coords = finish_coords(make_coords(height, width, width / height),
                           (width, height))
    base_uniforms = {
        "iResolution": jnp.asarray([width, height], jnp.float32),
        "iTime": jnp.asarray(0.5, jnp.float32),
        "iWantAspect": jnp.asarray(width / height, jnp.float32),
    }
    base_uniforms.update(uniforms or {})
    return Frag(
        coords=coords,
        uniforms=base_uniforms,
        statics=dict(statics or {}),
        textures=dict(textures or {}),
        texture_meta=dict(texture_meta or {}),
    )


def run(source, sf=None):
    sf = sf or make_sf()
    out = compile_fragment(source)(sf)
    return np.asarray(out), sf


def astuv_np(width=W, height=H):
    x = (np.arange(width, dtype=np.float32) + 0.5) / width
    y = 1.0 - (np.arange(height, dtype=np.float32) + 0.5) / height
    return np.stack(np.meshgrid(x, y, indexing="xy"), axis=-1)


# =========================================================================== #
# Expressions


def test_arithmetic_and_constructors():
    out, _ = run("""
        void main() {
            float x = astuv.x;
            vec3 c = vec3(x*x + 0.5, 2.0/4.0, mod(3.0, 2.0));
            fragColor = vec4(c, 1.0);
        }
    """)
    ax = astuv_np()[..., 0]
    np.testing.assert_allclose(out[..., 0], ax * ax + 0.5, rtol=1e-6)
    np.testing.assert_allclose(out[..., 1], 0.5)
    np.testing.assert_allclose(out[..., 2], 1.0)
    np.testing.assert_allclose(out[..., 3], 1.0)


def test_swizzle_read_write_and_compound_assign():
    out, _ = run("""
        void main() {
            vec4 c = vec4(0);
            c.xy = astuv;
            c.zw = c.yx * 2;
            c.x += 1;
            fragColor = c;
        }
    """)
    uv = astuv_np()
    np.testing.assert_allclose(out[..., 0], uv[..., 0] + 1, rtol=1e-6)
    np.testing.assert_allclose(out[..., 1], uv[..., 1], rtol=1e-6)
    np.testing.assert_allclose(out[..., 2], uv[..., 1] * 2, rtol=1e-6)
    np.testing.assert_allclose(out[..., 3], uv[..., 0] * 2, rtol=1e-6)


def test_duplicated_swizzle_and_index():
    out, _ = run("""
        void main() {
            vec3 s = astuv.xyx;
            fragColor = vec4(s.z, s[1], astuv[0], 1.0);
        }
    """)
    uv = astuv_np()
    np.testing.assert_allclose(out[..., 0], uv[..., 0], rtol=1e-6)
    np.testing.assert_allclose(out[..., 1], uv[..., 1], rtol=1e-6)
    np.testing.assert_allclose(out[..., 2], uv[..., 0], rtol=1e-6)


def test_matrix_times_vector_column_major():
    # mat2(a,b,c,d) columns are (a,b),(c,d): mat2(0,1,-1,0)*v = (-v.y, v.x)
    out, _ = run("""
        void main() {
            mat2 rot = mat2(0, 1, -1, 0);
            vec2 r = rot * astuv;
            fragColor = vec4(r, 0, 1);
        }
    """)
    uv = astuv_np()
    np.testing.assert_allclose(out[..., 0], -uv[..., 1], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[..., 1], uv[..., 0], rtol=1e-5, atol=1e-6)


def test_ternary_per_pixel():
    out, _ = run("""
        void main() {
            float v = (astuv.x < 0.5) ? 1.0 : 0.25;
            fragColor = vec4(v, 0, 0, 1);
        }
    """)
    uv = astuv_np()
    np.testing.assert_allclose(out[..., 0], np.where(uv[..., 0] < 0.5, 1.0, 0.25))


def test_define_macro_and_comments():
    out, _ = run("""
        /* block comment
           #define NOPE 9 */
        #define K 0.25   // trailing comment
        #define TWO_K (K + K)
        void main() {
            fragColor = vec4(K, TWO_K, 0, 1); // line comment
        }
    """)
    np.testing.assert_allclose(out[..., 0], 0.25)
    np.testing.assert_allclose(out[..., 1], 0.5)


def test_int_float_interop():
    out, _ = run("""
        void main() {
            int n = 3;
            float x = n / 2;        // int division = 1
            float y = n / 2.0;      // float division = 1.5
            fragColor = vec4(x, y, float(n), 1);
        }
    """)
    np.testing.assert_allclose(out[..., 0], 1.0)
    np.testing.assert_allclose(out[..., 1], 1.5)
    np.testing.assert_allclose(out[..., 2], 3.0)


# =========================================================================== #
# Control flow


def test_if_else_mask_merge():
    out, _ = run("""
        void main() {
            fragColor = vec4(0, 0, 0, 1);
            if (astuv.x < 0.5) {
                fragColor.r = 1.0;
            } else {
                fragColor.g = 1.0;
            }
        }
    """)
    uv = astuv_np()
    left = uv[..., 0] < 0.5
    np.testing.assert_allclose(out[..., 0], np.where(left, 1.0, 0.0))
    np.testing.assert_allclose(out[..., 1], np.where(left, 0.0, 1.0))


def test_early_return_divergent():
    out, _ = run("""
        void main() {
            fragColor = vec4(0, 0, 0, 1);
            if (astuv.x < 0.5) { fragColor.r = 1.0; return; }
            fragColor.g = 1.0;
        }
    """)
    uv = astuv_np()
    left = uv[..., 0] < 0.5
    np.testing.assert_allclose(out[..., 0], np.where(left, 1.0, 0.0))
    np.testing.assert_allclose(out[..., 1], np.where(left, 0.0, 1.0))


def test_for_loop_per_pixel_break():
    out, _ = run("""
        void main() {
            int n = int(astuv.x * 10);
            int count = 0;
            for (int i = 0; i < 10; i++) {
                if (i >= n) break;
                count++;
            }
            fragColor = vec4(float(count) / 10.0, 0, 0, 1);
        }
    """)
    n = (astuv_np()[..., 0] * 10).astype(np.int32)
    np.testing.assert_allclose(out[..., 0], n / 10.0, rtol=1e-6)


def test_for_loop_per_pixel_continue_rejoins_at_step():
    # continue skips the remaining body but still runs i++ (C semantics)
    out, _ = run("""
        void main() {
            int k = int(astuv.x * 4);
            int sum = 0;
            for (int i = 0; i < 4; i++) {
                if (i == k) continue;
                sum += i;
            }
            fragColor = vec4(float(sum) / 8.0, 0, 0, 1);
        }
    """)
    k = (astuv_np()[..., 0] * 4).astype(np.int32)
    np.testing.assert_allclose(out[..., 0], (6 - k) / 8.0, rtol=1e-6)


def test_nested_loops_inner_break_isolated():
    out, _ = run("""
        void main() {
            int k = int(astuv.x * 3);
            int total = 0;
            for (int i = 0; i < 3; i++) {
                for (int j = 0; j < 5; j++) {
                    if (j > k) break;
                    total += 1;
                }
            }
            fragColor = vec4(float(total) / 16.0, 0, 0, 1);
        }
    """)
    k = (astuv_np()[..., 0] * 3).astype(np.int32)
    np.testing.assert_allclose(out[..., 0], 3 * (k + 1) / 16.0, rtol=1e-6)


def test_outer_continue_lanes_stay_inactive_in_inner_loop():
    # Lanes that `continue` in the outer loop must NOT execute the inner
    # loop this iteration (regression: inner loop resetting continue_mask
    # used to re-activate them)
    out, _ = run("""
        void main() {
            int k = int(astuv.x * 3);
            int total = 0;
            for (int i = 0; i < 3; i++) {
                if (i == k) continue;
                for (int j = 0; j < 2; j++) { total += 1; }
            }
            fragColor = vec4(float(total) / 8.0, 0, 0, 1);
        }
    """)
    np.testing.assert_allclose(out[..., 0], 4 / 8.0, rtol=1e-6)


def test_return_inside_loop_freezes_lane():
    out, _ = run("""
        void main() {
            fragColor = vec4(0, 0, 0, 1);
            int n = int(astuv.x * 4);
            for (int i = 0; i < 4; i++) {
                if (i == n) { fragColor.r = float(i) / 4.0; return; }
            }
            fragColor.g = 1.0;
        }
    """)
    n = (astuv_np()[..., 0] * 4).astype(np.int32)
    np.testing.assert_allclose(out[..., 0], n / 4.0, rtol=1e-6)
    np.testing.assert_allclose(out[..., 1], 0.0)


def test_while_loop_uniform_condition():
    out, _ = run("""
        void main() {
            float x = 1.0;
            int n = 0;
            while (n < 5) { x *= 2.0; n++; }
            fragColor = vec4(x / 32.0, 0, 0, 1);
        }
    """)
    np.testing.assert_allclose(out[..., 0], 1.0)


def test_float_counter_loop_with_local_bound():
    # visualizer.frag's blur loop shape: float counter, bound from a local
    out, _ = run("""
        void main() {
            float quality = 4;
            float total = 0;
            for (float walk = 1.0/quality; walk <= 1.001; walk += 1.0/quality) {
                total += walk;
            }
            fragColor = vec4(total / 2.5, 0, 0, 1);
        }
    """)
    np.testing.assert_allclose(out[..., 0], 1.0, rtol=1e-5)


def test_lowered_big_loop_per_pixel_break():
    # > UNROLL_LIMIT trips: lowers to ONE lax.while_loop (body traced once).
    # Same per-lane break semantics as the unrolled path.
    out, _ = run("""
        void main() {
            int n = int(astuv.x * 40);
            int count = 0;
            for (int i = 0; i < 40; i++) {
                if (i >= n) break;
                count++;
            }
            fragColor = vec4(float(count) / 40.0, 0, 0, 1);
        }
    """)
    n = (astuv_np()[..., 0] * 40).astype(np.int32)
    np.testing.assert_allclose(out[..., 0], n / 40.0, rtol=1e-6)


def test_lowered_data_dependent_while():
    # Per-pixel while condition: impossible to unroll, must lower.
    out, _ = run("""
        void main() {
            float x = astuv.x;
            int n = 0;
            while (x < 0.9) { x += 0.1; n++; }
            fragColor = vec4(float(n) / 16.0, x, 0, 1);
        }
    """)
    uv = astuv_np()[..., 0]
    expect_n = np.zeros_like(uv, np.int32)
    expect_x = uv.copy()
    for _ in range(32):
        going = expect_x < 0.9
        expect_x = np.where(going, expect_x + np.float32(0.1), expect_x)
        expect_n += going
    np.testing.assert_allclose(out[..., 0], expect_n / 16.0, rtol=1e-6)
    np.testing.assert_allclose(out[..., 1], expect_x, rtol=1e-5)


def test_lowered_loop_return_and_continue():
    out, _ = run("""
        void main() {
            fragColor = vec4(0, 0, 0, 1);
            int k = int(astuv.x * 50);
            int sum = 0;
            for (int i = 0; i < 50; i++) {
                if (i == 7) continue;
                if (i == k) { fragColor.g = 1.0; return; }
                sum += 1;
            }
            fragColor.r = float(sum) / 49.0;
        }
    """)
    k = (astuv_np()[..., 0] * 50).astype(np.int32)
    returned = k != 7  # k==7 is skipped by continue, loop runs out
    np.testing.assert_allclose(out[..., 1], returned.astype(np.float32))
    np.testing.assert_allclose(out[..., 0], np.where(returned, 0.0, 1.0))


def test_lowered_loop_escape_iteration():
    # mandelbrot-style escape: per-pixel early exit with vec2 carry
    out, _ = run("""
        void main() {
            vec2 c = vec2(astuv.x * 0.5 - 1.5, astuv.y * 0.2);
            vec2 z = vec2(0);
            int n = 0;
            for (int i = 0; i < 64; i++) {
                if (dot(z, z) > 4.0) break;
                z = vec2(z.x*z.x - z.y*z.y, 2.0*z.x*z.y) + c;
                n++;
            }
            fragColor = vec4(float(n) / 64.0, 0, 0, 1);
        }
    """)
    uv = astuv_np()
    c = np.stack([uv[..., 0] * 0.5 - 1.5, uv[..., 1] * 0.2], -1).astype(np.float32)
    z = np.zeros_like(c)
    n = np.zeros(c.shape[:-1], np.int32)
    for _ in range(64):
        going = (z * z).sum(-1) <= 4.0
        z_new = np.stack([z[..., 0] ** 2 - z[..., 1] ** 2,
                          2 * z[..., 0] * z[..., 1]], -1) + c
        z = np.where(going[..., None], z_new, z)
        n += going
    np.testing.assert_allclose(out[..., 0], n / 64.0, rtol=1e-5)


def test_user_function_divergent_return():
    out, _ = run("""
        float pick(float x) {
            if (x < 0.5) return 1.0;
            return 2.0;
        }
        void main() {
            fragColor = vec4(pick(astuv.x) / 2.0, 0, 0, 1);
        }
    """)
    uv = astuv_np()
    np.testing.assert_allclose(out[..., 0],
                               np.where(uv[..., 0] < 0.5, 0.5, 1.0))


def test_const_array_dynamic_index():
    out, _ = run("""
        const int table[4] = int[4](7, 1, 5, 3);
        void main() {
            int k = int(astuv.x * 4);
            fragColor = vec4(float(table[k]) / 7.0, 0, 0, 1);
        }
    """)
    k = (astuv_np()[..., 0] * 4).astype(np.int32)
    table = np.array([7, 1, 5, 3], np.float32)
    np.testing.assert_allclose(out[..., 0], table[k] / 7.0, rtol=1e-6)


def test_discard_sets_context_mask():
    sf = make_sf()
    compile_fragment("""
        void main() {
            fragColor = vec4(1);
            if (astuv.x < 0.5) discard;
        }
    """)(sf)
    uv = astuv_np()
    np.testing.assert_array_equal(np.asarray(sf._discard), uv[..., 0] < 0.5)


# =========================================================================== #
# Texturing


def _tex_stack(data):
    """(H, W, C) -> the engine's (T, L, H, W, C) box layout."""
    return jnp.asarray(data, jnp.float32)[None, None]


def test_texture_sampling_and_texel_fetch():
    data = np.zeros((4, 8, 4), np.float32)
    data[..., 0] = np.arange(8, dtype=np.float32) / 8.0  # red ramp over x
    data[0, :, 1] = 1.0  # top row green (GL row H-1)
    sf = make_sf(textures={"iTex": _tex_stack(data)},
                 texture_meta={"iTex": _NearestMeta()})
    out, _ = run("""
        void main() {
            vec4 a = texture(iTex, astuv);
            vec4 b = texelFetch(iTex, ivec2(3, 3), 0);
            ivec2 size = textureSize(iTex);
            fragColor = vec4(a.r, b.g, float(size.x) / 8.0, 1.0);
        }
    """, sf)
    # texelFetch y=3 is 4th row from the bottom = numpy row 0 (green)
    np.testing.assert_allclose(out[..., 1], 1.0)
    np.testing.assert_allclose(out[..., 2], 1.0)
    # nearest-sampled red ramp matches per-column values
    expected = (np.floor(astuv_np()[..., 0] * 8) + 0.0) / 8.0
    np.testing.assert_allclose(out[..., 0], expected, atol=1e-6)


def test_temporal_box_naming_and_accessor():
    data = np.zeros((2, 1, 4, 8, 4), np.float32)
    data[0, 0, ..., 0] = 0.25  # newest frame red
    data[1, 0, ..., 0] = 0.75  # previous frame red
    sf = make_sf(textures={"iScreen": jnp.asarray(data)},
                 texture_meta={"iScreen": _Meta()})
    out, _ = run("""
        void main() {
            float now = texture(iScreen0x0, astuv).r;
            float before = texture(iScreen1x0, astuv).r;
            float also_before = iScreenTexture(1, 0, astuv).r;
            float alias = texture(iScreen1, astuv).r;
            fragColor = vec4(now, before, also_before, alias);
        }
    """, sf)
    np.testing.assert_allclose(out[..., 0], 0.25)
    np.testing.assert_allclose(out[..., 1], 0.75)
    np.testing.assert_allclose(out[..., 2], 0.75)
    np.testing.assert_allclose(out[..., 3], 0.75)


def test_sampler_as_function_parameter():
    data = np.full((4, 8, 4), 0.5, np.float32)
    sf = make_sf(textures={"iTex": _tex_stack(data)},
                 texture_meta={"iTex": _Meta()})
    out, _ = run("""
        vec4 fetch(sampler2D image, vec2 uv) {
            return texture(image, uv);
        }
        void main() { fragColor = fetch(iTex, astuv); }
    """, sf)
    np.testing.assert_allclose(out[..., 0], 0.5)


# =========================================================================== #
# Errors / unsupported constructs


def test_out_parameters_rejected():
    with pytest.raises(GlslError, match="out/inout"):
        compile_fragment("void f(out float x) { x = 1.0; } void main() {}")


def test_unknown_identifier_raises_at_run():
    main = compile_fragment("void main() { fragColor = vec4(mystery); }")
    with pytest.raises(GlslError, match="mystery"):
        main(make_sf())


def test_missing_main_rejected():
    with pytest.raises(GlslError, match="main"):
        compile_fragment("float helper() { return 1.0; }")


def test_syntax_error_carries_line_number():
    with pytest.raises(GlslError, match=":3"):
        compile_fragment("void main()\n{\n    float x = @;\n}")


def test_looks_like_glsl_heuristic():
    assert looks_like_glsl("void main() { fragColor = vec4(1); }")
    assert not looks_like_glsl("def main(sf):\n    return None\n")


# =========================================================================== #
# ShaderProgram integration


def test_shader_program_routes_glsl_source():
    from shaderflow_tpu.scene import ShaderScene
    scene = ShaderScene()
    scene.initialize()
    scene.shader.fragment = """
        void main() {
            fragColor = vec4(astuv, 0.5, 1.0);
        }
    """
    assert scene.shader.fragment is not missing_fragment
    assert getattr(scene.shader.fragment, "glsl_interpreter", None) is not None


def test_glsl_frag_file_scene_export(tmp_path):
    """A .frag file renders through the whole engine path."""
    from shaderflow_tpu.scene import ShaderScene
    frag = tmp_path / "ramp.frag"
    frag.write_text("""
        void main() {
            GetCamera(iCamera);
            fragColor = vec4(astuv.x, astuv.y, 0.5 + 0.5*sin(iTime), 1.0);
        }
    """)

    class GlslRamp(ShaderScene):
        def build(self):
            self.shader.fragment = frag

    out = tmp_path / "out.rgb"
    scene = GlslRamp()
    scene.main(width=64, height=32, fps=10, time=0.2, output=str(out))
    frames = np.fromfile(out, np.uint8).reshape(-1, 32, 64, 3)
    assert frames.shape[0] == 2
    # x/y ramps present
    assert frames[0, 0, -1, 0] > frames[0, 0, 0, 0]
    assert frames[0, 0, 0, 1] > frames[0, -1, 0, 1]


# =========================================================================== #
# Parity vs the reference's own example fragments

REF_SHADERS = Path("/root/reference/examples/basic/shaders")
needs_reference = pytest.mark.skipif(
    not REF_SHADERS.exists(), reason="reference checkout not available")


def render_scene(scene_class, frames=2, width=96, height=54, fps=10, **kwargs):
    with tempfile.TemporaryDirectory() as tmp:
        path = Path(tmp) / "out.rgb"
        scene = scene_class()
        scene.main(width=width, height=height, fps=fps, time=frames / fps,
                   output=str(path), **kwargs)
        data = np.fromfile(path, np.uint8).reshape(-1, height, width, 3)
        assert scene.shader.fragment is not missing_fragment, \
            "GLSL fragment failed to compile (fell back to missing shader)"
        return data


def psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _demo():
    import sys
    repo = Path(__file__).parent.parent
    sys.path.insert(0, str(repo / "examples" / "basic"))
    import demo
    return demo


def _glsl_subclass(base, frag_name, simulation=None):
    frag = REF_SHADERS / frag_name

    class GlslScene(base):
        def build(self):
            super().build()
            self.shader.fragment = frag
            if simulation is not None:
                self.simulation.fragment = REF_SHADERS / simulation

    GlslScene.__name__ = f"Glsl{base.__name__}"
    return GlslScene


@needs_reference
@pytest.mark.parametrize("scene_name,frag,frames,min_db", [
    ("ShaderToy", "shadertoy.frag", 2, 40),
    ("Waveform", "waveform.frag", 4, 40),
    ("MusicBars", "bars.frag", 4, 40),
    ("Multipass", "multipass.frag", 2, 40),
    ("MotionBlur", "motionblur.frag", 4, 40),
    ("Video", "video.frag", 2, 40),
    ("RayMarch", "raymarch.frag", 2, 35),
    ("Visualizer", "visualizer.frag", 4, 35),
])
def test_reference_fragment_parity(scene_name, frag, frames, min_db):
    """The reference's example .frag renders ≈ the repo's python fragment of
    the same scene (which is itself oracle-pinned vs GL, test_psnr_reference).
    """
    demo = _demo()
    base = getattr(demo, scene_name)
    ours = render_scene(base, frames=frames)
    theirs = render_scene(_glsl_subclass(base, frag), frames=frames)
    db = psnr(ours, theirs)
    assert db >= min_db, f"{scene_name}: GLSL front-end {db:.1f} dB vs python"


@needs_reference
def test_reference_life_parity():
    demo = _demo()
    scene_class = _glsl_subclass(demo.Life, "life/visuals.glsl",
                                 simulation="life/simulation.glsl")
    ours = render_scene(demo.Life, frames=14)
    theirs = render_scene(scene_class, frames=14)
    db = psnr(ours, theirs)
    assert db >= 40, f"Life: GLSL front-end {db:.1f} dB vs python"
    # Life must actually evolve (the GLSL simulation is the state machine)
    assert not np.array_equal(theirs[0], theirs[-1])
