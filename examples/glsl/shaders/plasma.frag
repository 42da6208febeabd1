/*
Plasma rings — an original demo of the GLSL authoring path.

This file is plain GLSL in the reference's fragment format; the framework
compiles it through shaderflow_tpu/glsl.py into the same jitted XLA program
a python shader would produce.
*/

#define RINGS 5

float ring(vec2 uv, float radius, float width) {
    return smoothstep(width, 0.0, abs(length(uv) - radius));
}

void main() {
    GetCamera(iCamera);
    vec2 uv = iCamera.gluv;

    // Slow swirl
    uv = rotate2d(0.3 * sin(iTime * 0.7)) * uv;

    vec3 col = vec3(0.02, 0.03, 0.08);
    for (int i = 0; i < RINGS; i++) {
        float phase = float(i) / RINGS;
        float radius = 0.25 + 0.6 * phase + 0.05 * sin(iTime * 2.0 + phase * TAU);
        float glow = ring(uv, radius, 0.12);
        col += glow * palette(phase + 0.1 * iTime,
                              vec3(0.5), vec3(0.5), vec3(1.0),
                              vec3(0.00, 0.33, 0.67));
    }

    // Soft vignette
    vec2 vig = astuv * (1.0 - astuv.yx);
    col *= pow(vig.x * vig.y * 15.0, 0.25);

    fragColor = vec4(col, 1.0);
}
