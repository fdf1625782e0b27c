#version 450
// CRT-style fragment shader: barrel distortion, scanlines, vignette.
// Fragment shaders run as graph nodes exactly like compute shaders; the
// `out vec4` color is the node's output_image.

layout (binding = 0) uniform sampler2D input_image;

layout (binding = 1) uniform UBO {
    float curvature;
    float scan_darkness;
};

layout (location = 0) in vec2 uv;
layout (location = 0) out vec4 out_color;

void main()
{
    float k = curvature <= 0.0 ? 0.12 : curvature;
    vec2 centered = uv * 2.0 - 1.0;
    vec2 warped = centered * (1.0 + k * dot(centered, centered));
    vec2 suv = warped * 0.5 + 0.5;

    vec4 c = texture(input_image, clamp(suv, vec2(0.0), vec2(1.0)));

    // Black outside the curved tube.
    float inside = step(abs(warped.x), 1.0) * step(abs(warped.y), 1.0);

    float dark = scan_darkness <= 0.0 ? 0.25 : scan_darkness;
    float line = 1.0 - dark * step(0.5, fract(gl_FragCoord.y * 0.5));

    float vig = 1.0 - 0.4 * dot(centered, centered);

    out_color = vec4(c.rgb * inside * line * vig, 1.0);
}
