"""
shaderflow_tpu.ops — the pure-JAX shader standard library.

`from shaderflow_tpu.ops import *` inside a pixel program gives the same
vocabulary the reference's GLSL metaprogrammer injects into every shader
(shaderflow.glsl + complex.glsl + camera.glsl), as numpy-style array ops.
"""

from shaderflow_tpu.ops import cameralib, complexmath, downsample, dynamics, quaternion, sampling, spectral
from shaderflow_tpu.ops.complexmath import (
    cadd, ccar, cconj, cdiv, cexp, cmag, cmul, cpol, cpow, csub,
)
from shaderflow_tpu.ops.sampling import (
    MipSampler, Sampler2D, agtexture, astexture, auto_lod, gmtexture, gtexture,
    mip_pyramid, resample_separable_blocked, sample, sample_mip,
    sample_mip_aniso, stexture, texel_fetch,
)
from shaderflow_tpu.ops.stdlib import *  # noqa: F401,F403 — the GLSL-like vocabulary
from shaderflow_tpu.ops.stdlib import (  # explicit re-exports for linters
    PI, TAU, SQRT2, SQRT3, SQRT5,
    vec2, vec3, vec4, X, Y, Z, W, XY, YX, RGB, A, with_alpha, with_rgb,
    fract, mix, clamp, step, smoothstep, glsl_mod, length, distance, dot, cross,
    normalize, reflect, sign, radians, degrees,
    proportion, lerp, smoothlerp, smin, smax, smoothmix, smix, triangle_wave,
    angle_between, rotate2d, rotate2deg, rotate3d, rotate3deg,
    stuv2gluv, gluv2stuv, s2g, g2s, agluv2gluv, gluv2agluv, stuv2stxy, stxy2stuv,
    astuv2stuv, stuv2astuv, agluv_mirrored_repeat, gluv_mirrored_repeat,
    astuv_oob, stuv_oob, agluv_oob, gluv_oob, polar2rect, sphere2rect,
    palette, palette_magma, is_black_key, is_white_key,
    sd_line, sd_line_segment, sd_sphere, sd_plane, sd_box, sd_octahedron,
    sd_union, sd_smooth_union, sd_subtraction, sd_smooth_subtraction,
    sd_intersection, sd_smooth_intersection,
    blend, alpha_composite, saturate, zoom,
    atan_normalized, atan1, atan1n, atan2, atan2n,
    hsv2rgb, hsv2rgb3, rgb2hsv, noise21, noise22, noise11,
)
