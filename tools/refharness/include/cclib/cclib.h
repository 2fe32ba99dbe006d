// Minimal stand-in for the reference's (empty, not-checked-out) cclib
// submodule, written from scratch so the reference CPU path tracer can be
// built HEADLESS in this image to produce real golden renders.
//
// It implements exactly the interface /root/reference/src/common.h:170-216
// imports (cc::math vec/mat types + transforms, cc::gfx color conversion),
// with GLM conventions (column-major matrices, RH look-at, OpenGL NDC
// perspective, glm::refract/reflect semantics) — the same conventions
// tracy_tpu/core/math.py implements, so both builds agree by construction.
//
// This is harness-support code, NOT part of the tracy_tpu framework.
#pragma once

#include <cmath>
#include <cstddef>
#include <cstdint>
// The reference calls unqualified abs(float) (collision.h:151-153). On MSVC
// (the author's platform) global float abs overloads always exist; on
// gcc/libstdc++ plain <cstdlib> only guarantees ::abs(int), which would
// silently truncate and break the SAT triangle-box test. Including the
// C++ wrapper <stdlib.h> pulls std::abs's float/double overloads into the
// global namespace, matching MSVC behavior.
#include <stdlib.h>

namespace cc
{

template <typename T, size_t N>
constexpr inline uint32_t array_size(const T (&)[N]) { return static_cast<uint32_t>(N); }

namespace math
{

constexpr float PI = 3.1415926535897932f;
constexpr float EPS = 1.e-8f;

struct vec3;

// POD 2/3-float views used for vec4 swizzle members (.xyz / .rgb).
struct swz3
{
    float x, y, z;
    inline operator vec3() const;
};

struct vec2
{
    float x{}, y{};
    constexpr vec2() = default;
    constexpr vec2(float s) : x(s), y(s) {}
    constexpr vec2(float in_x, float in_y) : x(in_x), y(in_y) {}
    float& operator[](int i) { return (&x)[i]; }
    const float& operator[](int i) const { return (&x)[i]; }
};

struct vec3
{
    union
    {
        struct { float x, y, z; };
        struct { float r, g, b; };
    };
    constexpr vec3() : x(0.f), y(0.f), z(0.f) {}
    constexpr vec3(float s) : x(s), y(s), z(s) {}
    constexpr vec3(float in_x, float in_y, float in_z) : x(in_x), y(in_y), z(in_z) {}
    float& operator[](int i) { return (&x)[i]; }
    const float& operator[](int i) const { return (&x)[i]; }
};

inline swz3::operator vec3() const { return vec3{ x, y, z }; }

struct vec4
{
    union
    {
        struct { float x, y, z, w; };
        struct { float r, g, b, a; };
        swz3 xyz;
        swz3 rgb;
    };
    constexpr vec4() : x(0.f), y(0.f), z(0.f), w(0.f) {}
    constexpr vec4(float s) : x(s), y(s), z(s), w(s) {}
    constexpr vec4(float in_x, float in_y, float in_z, float in_w)
        : x(in_x), y(in_y), z(in_z), w(in_w) {}
    constexpr vec4(const vec3& v, float in_w) : x(v.x), y(v.y), z(v.z), w(in_w) {}
    float& operator[](int i) { return (&x)[i]; }
    const float& operator[](int i) const { return (&x)[i]; }
};

// ---- vec2 ops ----
constexpr inline vec2 operator+(const vec2& a, const vec2& b) { return { a.x + b.x, a.y + b.y }; }
constexpr inline vec2 operator-(const vec2& a, const vec2& b) { return { a.x - b.x, a.y - b.y }; }
constexpr inline vec2 operator*(const vec2& a, float s) { return { a.x * s, a.y * s }; }
constexpr inline vec2 operator*(float s, const vec2& a) { return a * s; }
constexpr inline vec2 operator+(const vec2& a, float s) { return { a.x + s, a.y + s }; }
constexpr inline vec2 operator-(const vec2& a, float s) { return { a.x - s, a.y - s }; }
constexpr inline vec2 operator/(const vec2& a, float s) { return { a.x / s, a.y / s }; }

// ---- vec3 ops ----
constexpr inline vec3 operator+(const vec3& a, const vec3& b) { return { a.x + b.x, a.y + b.y, a.z + b.z }; }
constexpr inline vec3 operator-(const vec3& a, const vec3& b) { return { a.x - b.x, a.y - b.y, a.z - b.z }; }
constexpr inline vec3 operator*(const vec3& a, const vec3& b) { return { a.x * b.x, a.y * b.y, a.z * b.z }; }
constexpr inline vec3 operator/(const vec3& a, const vec3& b) { return { a.x / b.x, a.y / b.y, a.z / b.z }; }
constexpr inline vec3 operator*(const vec3& a, float s) { return { a.x * s, a.y * s, a.z * s }; }
constexpr inline vec3 operator*(float s, const vec3& a) { return a * s; }
constexpr inline vec3 operator/(const vec3& a, float s) { return { a.x / s, a.y / s, a.z / s }; }
constexpr inline vec3 operator/(float s, const vec3& a) { return { s / a.x, s / a.y, s / a.z }; }
constexpr inline vec3 operator+(const vec3& a, float s) { return { a.x + s, a.y + s, a.z + s }; }
constexpr inline vec3 operator+(float s, const vec3& a) { return a + s; }
constexpr inline vec3 operator-(const vec3& a, float s) { return { a.x - s, a.y - s, a.z - s }; }
constexpr inline vec3 operator-(float s, const vec3& a) { return { s - a.x, s - a.y, s - a.z }; }
constexpr inline vec3 operator-(const vec3& a) { return { -a.x, -a.y, -a.z }; }
inline vec3& operator+=(vec3& a, const vec3& b) { a.x += b.x; a.y += b.y; a.z += b.z; return a; }
inline vec3& operator-=(vec3& a, const vec3& b) { a.x -= b.x; a.y -= b.y; a.z -= b.z; return a; }
inline vec3& operator*=(vec3& a, const vec3& b) { a.x *= b.x; a.y *= b.y; a.z *= b.z; return a; }
inline vec3& operator*=(vec3& a, float s) { a.x *= s; a.y *= s; a.z *= s; return a; }
inline vec3& operator/=(vec3& a, float s) { a.x /= s; a.y /= s; a.z /= s; return a; }
constexpr inline bool operator==(const vec3& a, const vec3& b) { return a.x == b.x && a.y == b.y && a.z == b.z; }
constexpr inline bool operator!=(const vec3& a, const vec3& b) { return !(a == b); }

// ---- vec4 ops ----
constexpr inline vec4 operator+(const vec4& a, const vec4& b) { return { a.x + b.x, a.y + b.y, a.z + b.z, a.w + b.w }; }
constexpr inline vec4 operator-(const vec4& a, const vec4& b) { return { a.x - b.x, a.y - b.y, a.z - b.z, a.w - b.w }; }
constexpr inline vec4 operator*(const vec4& a, const vec4& b) { return { a.x * b.x, a.y * b.y, a.z * b.z, a.w * b.w }; }
constexpr inline vec4 operator*(const vec4& a, float s) { return { a.x * s, a.y * s, a.z * s, a.w * s }; }
constexpr inline vec4 operator*(float s, const vec4& a) { return a * s; }
constexpr inline vec4 operator/(const vec4& a, float s) { return { a.x / s, a.y / s, a.z / s, a.w / s }; }
inline vec4& operator+=(vec4& a, const vec4& b) { a.x += b.x; a.y += b.y; a.z += b.z; a.w += b.w; return a; }
inline vec4& operator*=(vec4& a, float s) { a.x *= s; a.y *= s; a.z *= s; a.w *= s; return a; }
inline vec4& operator/=(vec4& a, float s) { a.x /= s; a.y /= s; a.z /= s; a.w /= s; return a; }

// ---- matrices (column-major, GLM layout: m[c] is column c) ----
struct mat4;

struct mat3
{
    vec3 col[3];
    constexpr mat3() : col{ {1,0,0}, {0,1,0}, {0,0,1} } {}
    constexpr mat3(float d) : col{ {d,0,0}, {0,d,0}, {0,0,d} } {}
    constexpr mat3(const vec3& c0, const vec3& c1, const vec3& c2) : col{ c0, c1, c2 } {}
    explicit inline mat3(const mat4& m);  // upper-left 3x3, defined below
    vec3& operator[](int i) { return col[i]; }
    const vec3& operator[](int i) const { return col[i]; }
};

struct mat4
{
    vec4 col[4];
    constexpr mat4() : col{ {1,0,0,0}, {0,1,0,0}, {0,0,1,0}, {0,0,0,1} } {}
    constexpr mat4(float d) : col{ {d,0,0,0}, {0,d,0,0}, {0,0,d,0}, {0,0,0,d} } {}
    constexpr mat4(const vec4& c0, const vec4& c1, const vec4& c2, const vec4& c3)
        : col{ c0, c1, c2, c3 } {}
    vec4& operator[](int i) { return col[i]; }
    const vec4& operator[](int i) const { return col[i]; }
};

inline mat3::mat3(const mat4& m)
    : col{ { m[0][0], m[0][1], m[0][2] },
           { m[1][0], m[1][1], m[1][2] },
           { m[2][0], m[2][1], m[2][2] } }
{}

inline vec3 operator*(const mat3& m, const vec3& v)
{
    return m.col[0] * v.x + m.col[1] * v.y + m.col[2] * v.z;
}

inline vec4 operator*(const mat4& m, const vec4& v)
{
    return m.col[0] * v.x + m.col[1] * v.y + m.col[2] * v.z + m.col[3] * v.w;
}

inline mat4 operator*(const mat4& a, const mat4& b)
{
    mat4 r(0.f);
    for (int c = 0; c < 4; ++c) r.col[c] = a * b.col[c];
    return r;
}

// ---- scalar helpers ----
template <typename T> constexpr inline T max(const T& a, const T& b) { return a > b ? a : b; }
template <typename T> constexpr inline T min(const T& a, const T& b) { return a < b ? a : b; }
constexpr inline float radians(float deg) { return deg * (PI / 180.f); }
constexpr inline float rcp(float x) { return 1.f / x; }
constexpr inline vec3 rcp(const vec3& v) { return { 1.f / v.x, 1.f / v.y, 1.f / v.z }; }
constexpr inline float clamp(float x, float lo, float hi) { return x < lo ? lo : (x > hi ? hi : x); }
constexpr inline vec3 clamp(const vec3& x, const vec3& lo, const vec3& hi)
{
    return { clamp(x.x, lo.x, hi.x), clamp(x.y, lo.y, hi.y), clamp(x.z, lo.z, hi.z) };
}
constexpr inline float lerp(float a, float b, float t) { return a + t * (b - a); }
constexpr inline vec2 lerp(const vec2& a, const vec2& b, float t) { return a + (b - a) * t; }
constexpr inline vec3 lerp(const vec3& a, const vec3& b, float t) { return a + (b - a) * t; }
constexpr inline vec3 lerp(const vec3& a, const vec3& b, const vec3& t)
{
    return { lerp(a.x, b.x, t.x), lerp(a.y, b.y, t.y), lerp(a.z, b.z, t.z) };
}
inline float frac(float x) { return x - std::floor(x); }
constexpr inline vec3 pmin(const vec3& a, const vec3& b) { return { min(a.x, b.x), min(a.y, b.y), min(a.z, b.z) }; }
constexpr inline vec3 pmax(const vec3& a, const vec3& b) { return { max(a.x, b.x), max(a.y, b.y), max(a.z, b.z) }; }

// ---- geometry ----
constexpr inline float dot(const vec2& a, const vec2& b) { return a.x * b.x + a.y * b.y; }
constexpr inline float dot(const vec3& a, const vec3& b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
constexpr inline float dot(const vec4& a, const vec4& b) { return a.x * b.x + a.y * b.y + a.z * b.z + a.w * b.w; }
constexpr inline vec3 cross(const vec3& a, const vec3& b)
{
    return { a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x };
}
inline float length(const vec2& v) { return std::sqrt(dot(v, v)); }
inline float length(const vec3& v) { return std::sqrt(dot(v, v)); }
inline float distance(const vec3& a, const vec3& b) { return length(a - b); }
inline vec2 normalize(const vec2& v) { return v / length(v); }
inline vec3 normalize(const vec3& v) { return v / length(v); }
constexpr inline vec3 reflect(const vec3& i, const vec3& n) { return i - 2.f * dot(n, i) * n; }
inline vec3 refract(const vec3& i, const vec3& n, float eta)
{
    // glm::refract semantics: returns vec3(0) on total internal reflection.
    const float d = dot(n, i);
    const float k = 1.f - eta * eta * (1.f - d * d);
    if (k < 0.f) return vec3{ 0.f };
    return eta * i - (eta * d + std::sqrt(k)) * n;
}

// ---- matrix transforms (GLM conventions) ----
inline mat4 transpose(const mat4& m)
{
    mat4 r(0.f);
    for (int c = 0; c < 4; ++c)
        for (int rr = 0; rr < 4; ++rr)
            r[c][rr] = m[rr][c];
    return r;
}

inline mat4 inverse(const mat4& m)
{
    // general 4x4 inverse via cofactors (same as glm::inverse).
    const float c00 = m[2][2] * m[3][3] - m[3][2] * m[2][3];
    const float c02 = m[1][2] * m[3][3] - m[3][2] * m[1][3];
    const float c03 = m[1][2] * m[2][3] - m[2][2] * m[1][3];
    const float c04 = m[2][1] * m[3][3] - m[3][1] * m[2][3];
    const float c06 = m[1][1] * m[3][3] - m[3][1] * m[1][3];
    const float c07 = m[1][1] * m[2][3] - m[2][1] * m[1][3];
    const float c08 = m[2][1] * m[3][2] - m[3][1] * m[2][2];
    const float c10 = m[1][1] * m[3][2] - m[3][1] * m[1][2];
    const float c11 = m[1][1] * m[2][2] - m[2][1] * m[1][2];
    const float c12 = m[2][0] * m[3][3] - m[3][0] * m[2][3];
    const float c14 = m[1][0] * m[3][3] - m[3][0] * m[1][3];
    const float c15 = m[1][0] * m[2][3] - m[2][0] * m[1][3];
    const float c16 = m[2][0] * m[3][2] - m[3][0] * m[2][2];
    const float c18 = m[1][0] * m[3][2] - m[3][0] * m[1][2];
    const float c19 = m[1][0] * m[2][2] - m[2][0] * m[1][2];
    const float c20 = m[2][0] * m[3][1] - m[3][0] * m[2][1];
    const float c22 = m[1][0] * m[3][1] - m[3][0] * m[1][1];
    const float c23 = m[1][0] * m[2][1] - m[2][0] * m[1][1];

    const vec4 f0{ c00, c00, c02, c03 };
    const vec4 f1{ c04, c04, c06, c07 };
    const vec4 f2{ c08, c08, c10, c11 };
    const vec4 f3{ c12, c12, c14, c15 };
    const vec4 f4{ c16, c16, c18, c19 };
    const vec4 f5{ c20, c20, c22, c23 };

    const vec4 v0{ m[1][0], m[0][0], m[0][0], m[0][0] };
    const vec4 v1{ m[1][1], m[0][1], m[0][1], m[0][1] };
    const vec4 v2{ m[1][2], m[0][2], m[0][2], m[0][2] };
    const vec4 v3{ m[1][3], m[0][3], m[0][3], m[0][3] };

    const vec4 inv0{ v1 * f0 - v2 * f1 + v3 * f2 };
    const vec4 inv1{ v0 * f0 - v2 * f3 + v3 * f4 };
    const vec4 inv2{ v0 * f1 - v1 * f3 + v3 * f5 };
    const vec4 inv3{ v0 * f2 - v1 * f4 + v2 * f5 };

    const vec4 sign_a{ +1, -1, +1, -1 };
    const vec4 sign_b{ -1, +1, -1, +1 };
    mat4 inv{ inv0 * sign_a, inv1 * sign_b, inv2 * sign_a, inv3 * sign_b };

    const vec4 row0{ inv[0][0], inv[1][0], inv[2][0], inv[3][0] };
    const float det = dot(m[0], row0);
    const float inv_det = 1.f / det;
    for (int c = 0; c < 4; ++c) inv[c] *= inv_det;
    return inv;
}

inline mat4 translate(const mat4& m, const vec3& v)
{
    mat4 r{ m };
    r[3] = m[0] * v.x + m[1] * v.y + m[2] * v.z + m[3];
    return r;
}

inline mat4 rotate(const mat4& m, float angle, const vec3& axis_in)
{
    const float c = std::cos(angle);
    const float s = std::sin(angle);
    const vec3 axis = normalize(axis_in);
    const vec3 temp = (1.f - c) * axis;

    mat4 rot(0.f);
    rot[0][0] = c + temp.x * axis.x;
    rot[0][1] = temp.x * axis.y + s * axis.z;
    rot[0][2] = temp.x * axis.z - s * axis.y;
    rot[1][0] = temp.y * axis.x - s * axis.z;
    rot[1][1] = c + temp.y * axis.y;
    rot[1][2] = temp.y * axis.z + s * axis.x;
    rot[2][0] = temp.z * axis.x + s * axis.y;
    rot[2][1] = temp.z * axis.y - s * axis.x;
    rot[2][2] = c + temp.z * axis.z;

    mat4 r(0.f);
    r[0] = m[0] * rot[0][0] + m[1] * rot[0][1] + m[2] * rot[0][2];
    r[1] = m[0] * rot[1][0] + m[1] * rot[1][1] + m[2] * rot[1][2];
    r[2] = m[0] * rot[2][0] + m[1] * rot[2][1] + m[2] * rot[2][2];
    r[3] = m[3];
    return r;
}

inline mat4 scale(const mat4& m, const vec3& v)
{
    mat4 r(0.f);
    r[0] = m[0] * v.x;
    r[1] = m[1] * v.y;
    r[2] = m[2] * v.z;
    r[3] = m[3];
    return r;
}

inline mat4 perspective(float fovy, float aspect, float znear, float zfar)
{
    // glm::perspectiveRH_NO (the GLM default): OpenGL -1..1 NDC depth.
    const float tan_half = std::tan(fovy / 2.f);
    mat4 r(0.f);
    r[0][0] = 1.f / (aspect * tan_half);
    r[1][1] = 1.f / tan_half;
    r[2][2] = -(zfar + znear) / (zfar - znear);
    r[2][3] = -1.f;
    r[3][2] = -(2.f * zfar * znear) / (zfar - znear);
    r[3][3] = 0.f;
    return r;
}

inline mat4 lookAt(const vec3& eye, const vec3& center, const vec3& up)
{
    // glm::lookAtRH.
    const vec3 f = normalize(center - eye);
    const vec3 s = normalize(cross(f, up));
    const vec3 u = cross(s, f);
    mat4 r(1.f);
    r[0][0] = s.x;  r[1][0] = s.y;  r[2][0] = s.z;
    r[0][1] = u.x;  r[1][1] = u.y;  r[2][1] = u.z;
    r[0][2] = -f.x; r[1][2] = -f.y; r[2][2] = -f.z;
    r[3][0] = -dot(s, eye);
    r[3][1] = -dot(u, eye);
    r[3][2] = dot(f, eye);
    return r;
}

// precise trig is fine here: the reference's glm::fastCos/fastSin are
// approximations of these, and all comparisons are statistical.
inline float cosf(float x) { return std::cos(x); }
inline float sinf(float x) { return std::sin(x); }
inline float sqrtf(float x) { return std::sqrt(x); }
using std::pow;

}  // namespace math

namespace gfx
{

inline float srgb(float c)
{
    return c <= 0.0031308f ? 12.92f * c : 1.055f * std::pow(c, 1.f / 2.4f) - 0.055f;
}

inline math::vec3 srgb(const math::vec3& c) { return { srgb(c.x), srgb(c.y), srgb(c.z) }; }

inline float linear(float c)
{
    return c <= 0.04045f ? c / 12.92f : std::pow((c + 0.055f) / 1.055f, 2.4f);
}

inline math::vec3 linear(const math::vec3& c) { return { linear(c.x), linear(c.y), linear(c.z) }; }

inline math::vec4 linear(const math::vec4& c)
{
    // like glm's vec4 overload: alpha stays linear.
    return { linear(c.x), linear(c.y), linear(c.z), c.w };
}

inline math::vec4 srgb(const math::vec4& c) { return { srgb(c.x), srgb(c.y), srgb(c.z), c.w }; }

inline math::vec3 reinhard(const math::vec3& c) { return c / (math::vec3{ 1.f } + c); }

inline math::vec3 aces(const math::vec3& c)
{
    const float a = 2.51f, b = 0.03f, y = 2.43f, d = 0.59f, e = 0.14f;
    return math::clamp((c * (a * c + b)) / (c * (y * c + d) + e),
                       math::vec3{ 0.f }, math::vec3{ 1.f });
}

}  // namespace gfx

}  // namespace cc
