// Minimal GLM-compatible math shim — just enough of the glm API surface to
// compile the reference renderer for golden-image generation (the real GLM
// cannot be fetched in this offline environment).  Semantics follow GLM
// 0.9.9.8: column-indexed mat4 (m[i] is a vec4), row-vector products
// (v * m → result[i] = dot(v, m[i])), componentwise math functions, and
// GLM's mix/mod/fract/clamp definitions.  float-only (the reference uses
// only single precision).
#pragma once

#include <cmath>
#include <cstdint>
#include <limits>

namespace glm {

template <typename T>
struct tvec2 {
    union { struct { T x, y; }; struct { T r, g; }; struct { T s, t; }; };
    tvec2() : x(0), y(0) {}
    explicit tvec2(T s) : x(s), y(s) {}
    tvec2(T x_, T y_) : x(x_), y(y_) {}
    template <typename U>
    explicit tvec2(const tvec2<U>& o) : x(T(o.x)), y(T(o.y)) {}
    T& operator[](int i) { return (&x)[i]; }
    const T& operator[](int i) const { return (&x)[i]; }
    tvec2& operator+=(const tvec2& o) { x += o.x; y += o.y; return *this; }
    tvec2& operator-=(const tvec2& o) { x -= o.x; y -= o.y; return *this; }
    tvec2& operator*=(T s) { x *= s; y *= s; return *this; }
    tvec2& operator/=(T s) { x /= s; y /= s; return *this; }
};

template <typename T>
struct tvec4;

template <typename T>
struct tvec3 {
    union { struct { T x, y, z; }; struct { T r, g, b; }; };
    tvec3() : x(0), y(0), z(0) {}
    explicit tvec3(T s) : x(s), y(s), z(s) {}
    tvec3(T x_, T y_, T z_) : x(x_), y(y_), z(z_) {}
    template <typename U>
    explicit tvec3(const tvec3<U>& o) : x(T(o.x)), y(T(o.y)), z(T(o.z)) {}
    tvec3(const tvec4<T>& o);  // implicit, as in default GLM config
    tvec3(const tvec2<T>& v, T z_) : x(v.x), y(v.y), z(z_) {}
    T& operator[](int i) { return (&x)[i]; }
    const T& operator[](int i) const { return (&x)[i]; }
    tvec3& operator+=(const tvec3& o) { x += o.x; y += o.y; z += o.z; return *this; }
    tvec3& operator-=(const tvec3& o) { x -= o.x; y -= o.y; z -= o.z; return *this; }
    tvec3& operator*=(const tvec3& o) { x *= o.x; y *= o.y; z *= o.z; return *this; }
    tvec3& operator*=(T s) { x *= s; y *= s; z *= s; return *this; }
    tvec3& operator/=(const tvec3& o) { x /= o.x; y /= o.y; z /= o.z; return *this; }
    tvec3& operator/=(T s) { x /= s; y /= s; z /= s; return *this; }
};

template <typename T>
struct tvec4 {
    union { struct { T x, y, z, w; }; struct { T r, g, b, a; }; };
    tvec4() : x(0), y(0), z(0), w(0) {}
    explicit tvec4(T s) : x(s), y(s), z(s), w(s) {}
    tvec4(T x_, T y_, T z_, T w_) : x(x_), y(y_), z(z_), w(w_) {}
    tvec4(const tvec3<T>& v, T w_) : x(v.x), y(v.y), z(v.z), w(w_) {}
    tvec4(const tvec2<T>& v, T z_, T w_) : x(v.x), y(v.y), z(z_), w(w_) {}
    T& operator[](int i) { return (&x)[i]; }
    const T& operator[](int i) const { return (&x)[i]; }
    tvec4& operator+=(const tvec4& o) { x += o.x; y += o.y; z += o.z; w += o.w; return *this; }
    tvec4& operator*=(T s) { x *= s; y *= s; z *= s; w *= s; return *this; }
};

template <typename T>
inline tvec3<T>::tvec3(const tvec4<T>& o) : x(o.x), y(o.y), z(o.z) {}

typedef tvec2<float> vec2;
typedef tvec3<float> vec3;
typedef tvec4<float> vec4;
typedef tvec3<int> ivec3;

// ---- vec2 ops
inline vec2 operator+(const vec2& a, const vec2& b) { return vec2(a.x + b.x, a.y + b.y); }
inline vec2 operator-(const vec2& a, const vec2& b) { return vec2(a.x - b.x, a.y - b.y); }
inline vec2 operator*(const vec2& a, const vec2& b) { return vec2(a.x * b.x, a.y * b.y); }
inline vec2 operator*(const vec2& a, float s) { return vec2(a.x * s, a.y * s); }
inline vec2 operator*(float s, const vec2& a) { return vec2(a.x * s, a.y * s); }
inline vec2 operator/(const vec2& a, float s) { return vec2(a.x / s, a.y / s); }
inline vec2 operator/(const vec2& a, const vec2& b) { return vec2(a.x / b.x, a.y / b.y); }
inline vec2 operator-(const vec2& a) { return vec2(-a.x, -a.y); }

// ---- vec3 ops
inline vec3 operator+(const vec3& a, const vec3& b) { return vec3(a.x + b.x, a.y + b.y, a.z + b.z); }
inline vec3 operator-(const vec3& a, const vec3& b) { return vec3(a.x - b.x, a.y - b.y, a.z - b.z); }
inline vec3 operator*(const vec3& a, const vec3& b) { return vec3(a.x * b.x, a.y * b.y, a.z * b.z); }
inline vec3 operator/(const vec3& a, const vec3& b) { return vec3(a.x / b.x, a.y / b.y, a.z / b.z); }
inline vec3 operator+(const vec3& a, float s) { return vec3(a.x + s, a.y + s, a.z + s); }
inline vec3 operator-(const vec3& a, float s) { return vec3(a.x - s, a.y - s, a.z - s); }
inline vec3 operator+(float s, const vec3& a) { return vec3(s + a.x, s + a.y, s + a.z); }
inline vec3 operator-(float s, const vec3& a) { return vec3(s - a.x, s - a.y, s - a.z); }
inline vec3 operator*(const vec3& a, float s) { return vec3(a.x * s, a.y * s, a.z * s); }
inline vec3 operator*(float s, const vec3& a) { return vec3(a.x * s, a.y * s, a.z * s); }
inline vec3 operator/(const vec3& a, float s) { return vec3(a.x / s, a.y / s, a.z / s); }
inline vec3 operator/(float s, const vec3& a) { return vec3(s / a.x, s / a.y, s / a.z); }
inline vec3 operator-(const vec3& a) { return vec3(-a.x, -a.y, -a.z); }
inline bool operator==(const vec3& a, const vec3& b) { return a.x == b.x && a.y == b.y && a.z == b.z; }
inline bool operator!=(const vec3& a, const vec3& b) { return !(a == b); }

// ---- vec4 ops
inline vec4 operator+(const vec4& a, const vec4& b) { return vec4(a.x + b.x, a.y + b.y, a.z + b.z, a.w + b.w); }
inline vec4 operator-(const vec4& a, const vec4& b) { return vec4(a.x - b.x, a.y - b.y, a.z - b.z, a.w - b.w); }
inline vec4 operator*(const vec4& a, float s) { return vec4(a.x * s, a.y * s, a.z * s, a.w * s); }
inline vec4 operator*(float s, const vec4& a) { return a * s; }
inline vec4 operator/(const vec4& a, float s) { return vec4(a.x / s, a.y / s, a.z / s, a.w / s); }
inline vec4 operator-(const vec4& a) { return vec4(-a.x, -a.y, -a.z, -a.w); }

// ---- ivec3 ops
inline ivec3 operator+(const ivec3& a, const ivec3& b) { return ivec3(a.x + b.x, a.y + b.y, a.z + b.z); }
inline ivec3 operator-(const ivec3& a, const ivec3& b) { return ivec3(a.x - b.x, a.y - b.y, a.z - b.z); }

// ---- mat4 (column-indexed like GLM: m[i] is a vec4)
struct mat4 {
    vec4 value[4];
    mat4() {}
    explicit mat4(float d) {
        value[0] = vec4(d, 0.f, 0.f, 0.f);
        value[1] = vec4(0.f, d, 0.f, 0.f);
        value[2] = vec4(0.f, 0.f, d, 0.f);
        value[3] = vec4(0.f, 0.f, 0.f, d);
    }
    vec4& operator[](int i) { return value[i]; }
    const vec4& operator[](int i) const { return value[i]; }
};

inline float dot(const vec2& a, const vec2& b) { return a.x * b.x + a.y * b.y; }
inline float dot(const vec3& a, const vec3& b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline float dot(const vec4& a, const vec4& b) { return a.x * b.x + a.y * b.y + a.z * b.z + a.w * b.w; }

// GLM row-vector product: result[i] = dot(v, m[i])
inline vec4 operator*(const vec4& v, const mat4& m) {
    return vec4(dot(v, m[0]), dot(v, m[1]), dot(v, m[2]), dot(v, m[3]));
}
// GLM column product: result[i] = sum_j m[j][i] * v[j]
inline vec4 operator*(const mat4& m, const vec4& v) {
    return vec4(
        m[0].x * v.x + m[1].x * v.y + m[2].x * v.z + m[3].x * v.w,
        m[0].y * v.x + m[1].y * v.y + m[2].y * v.z + m[3].y * v.w,
        m[0].z * v.x + m[1].z * v.y + m[2].z * v.z + m[3].z * v.w,
        m[0].w * v.x + m[1].w * v.y + m[2].w * v.z + m[3].w * v.w);
}
inline mat4 operator*(const mat4& a, const mat4& b) {
    mat4 r;
    for (int i = 0; i < 4; ++i) r[i] = a * b[i];
    return r;
}

inline mat4 transpose(const mat4& m) {
    mat4 r;
    for (int i = 0; i < 4; ++i)
        for (int j = 0; j < 4; ++j) r[i][j] = m[j][i];
    return r;
}

inline mat4 inverse(const mat4& m) {
    // Laplace-expansion inverse (same formulation as GLM's compute_inverse).
    float c00 = m[2][2] * m[3][3] - m[3][2] * m[2][3];
    float c02 = m[1][2] * m[3][3] - m[3][2] * m[1][3];
    float c03 = m[1][2] * m[2][3] - m[2][2] * m[1][3];
    float c04 = m[2][1] * m[3][3] - m[3][1] * m[2][3];
    float c06 = m[1][1] * m[3][3] - m[3][1] * m[1][3];
    float c07 = m[1][1] * m[2][3] - m[2][1] * m[1][3];
    float c08 = m[2][1] * m[3][2] - m[3][1] * m[2][2];
    float c10 = m[1][1] * m[3][2] - m[3][1] * m[1][2];
    float c11 = m[1][1] * m[2][2] - m[2][1] * m[1][2];
    float c12 = m[2][0] * m[3][3] - m[3][0] * m[2][3];
    float c14 = m[1][0] * m[3][3] - m[3][0] * m[1][3];
    float c15 = m[1][0] * m[2][3] - m[2][0] * m[1][3];
    float c16 = m[2][0] * m[3][2] - m[3][0] * m[2][2];
    float c18 = m[1][0] * m[3][2] - m[3][0] * m[1][2];
    float c19 = m[1][0] * m[2][2] - m[2][0] * m[1][2];
    float c20 = m[2][0] * m[3][1] - m[3][0] * m[2][1];
    float c22 = m[1][0] * m[3][1] - m[3][0] * m[1][1];
    float c23 = m[1][0] * m[2][1] - m[2][0] * m[1][1];

    vec4 f0(c00, c00, c02, c03);
    vec4 f1(c04, c04, c06, c07);
    vec4 f2(c08, c08, c10, c11);
    vec4 f3(c12, c12, c14, c15);
    vec4 f4(c16, c16, c18, c19);
    vec4 f5(c20, c20, c22, c23);

    vec4 v0(m[1][0], m[0][0], m[0][0], m[0][0]);
    vec4 v1(m[1][1], m[0][1], m[0][1], m[0][1]);
    vec4 v2(m[1][2], m[0][2], m[0][2], m[0][2]);
    vec4 v3(m[1][3], m[0][3], m[0][3], m[0][3]);

    auto mul = [](const vec4& a, const vec4& b) {
        return vec4(a.x * b.x, a.y * b.y, a.z * b.z, a.w * b.w);
    };
    vec4 inv0 = mul(v1, f0) - mul(v2, f1) + mul(v3, f2);
    vec4 inv1 = mul(v0, f0) - mul(v2, f3) + mul(v3, f4);
    vec4 inv2 = mul(v0, f1) - mul(v1, f3) + mul(v3, f5);
    vec4 inv3 = mul(v0, f2) - mul(v1, f4) + mul(v2, f5);

    vec4 signA(+1.f, -1.f, +1.f, -1.f);
    vec4 signB(-1.f, +1.f, -1.f, +1.f);
    mat4 inv;
    inv[0] = mul(inv0, signA);
    inv[1] = mul(inv1, signB);
    inv[2] = mul(inv2, signA);
    inv[3] = mul(inv3, signB);

    vec4 row0(inv[0][0], inv[1][0], inv[2][0], inv[3][0]);
    float det = dot(m[0], row0);
    float ood = 1.f / det;
    for (int i = 0; i < 4; ++i) inv[i] *= ood;
    return inv;
}

inline vec3 cross(const vec3& a, const vec3& b) {
    return vec3(a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
                a.x * b.y - a.y * b.x);
}
inline float length(const vec3& v) { return std::sqrt(dot(v, v)); }
inline float length(const vec2& v) { return std::sqrt(dot(v, v)); }
inline vec3 normalize(const vec3& v) { return v * (1.f / std::sqrt(dot(v, v))); }
inline vec2 normalize(const vec2& v) { return v * (1.f / std::sqrt(dot(v, v))); }
inline vec4 normalize(const vec4& v) { return v * (1.f / std::sqrt(dot(v, v))); }

// ---- componentwise / scalar math (GLM definitions)
inline float min(float a, float b) { return b < a ? b : a; }
inline float max(float a, float b) { return a < b ? b : a; }
inline int min(int a, int b) { return b < a ? b : a; }
inline int max(int a, int b) { return a < b ? b : a; }
inline uint32_t min(uint32_t a, uint32_t b) { return b < a ? b : a; }
inline uint32_t max(uint32_t a, uint32_t b) { return a < b ? b : a; }
inline vec3 min(const vec3& a, const vec3& b) { return vec3(min(a.x, b.x), min(a.y, b.y), min(a.z, b.z)); }
inline vec3 max(const vec3& a, const vec3& b) { return vec3(max(a.x, b.x), max(a.y, b.y), max(a.z, b.z)); }
inline vec3 min(const vec3& a, float b) { return vec3(min(a.x, b), min(a.y, b), min(a.z, b)); }
inline vec3 max(const vec3& a, float b) { return vec3(max(a.x, b), max(a.y, b), max(a.z, b)); }
inline vec2 min(const vec2& a, const vec2& b) { return vec2(min(a.x, b.x), min(a.y, b.y)); }
inline vec2 max(const vec2& a, const vec2& b) { return vec2(max(a.x, b.x), max(a.y, b.y)); }
inline ivec3 min(const ivec3& a, const ivec3& b) { return ivec3(min(a.x, b.x), min(a.y, b.y), min(a.z, b.z)); }
inline ivec3 max(const ivec3& a, const ivec3& b) { return ivec3(max(a.x, b.x), max(a.y, b.y), max(a.z, b.z)); }

inline float abs(float a) { return std::fabs(a); }
inline int abs(int a) { return a < 0 ? -a : a; }
inline vec3 abs(const vec3& a) { return vec3(std::fabs(a.x), std::fabs(a.y), std::fabs(a.z)); }
inline vec2 abs(const vec2& a) { return vec2(std::fabs(a.x), std::fabs(a.y)); }

inline float sqrt(float a) { return std::sqrt(a); }
inline vec3 sqrt(const vec3& a) { return vec3(std::sqrt(a.x), std::sqrt(a.y), std::sqrt(a.z)); }
inline float floor(float a) { return std::floor(a); }
inline vec3 floor(const vec3& a) { return vec3(std::floor(a.x), std::floor(a.y), std::floor(a.z)); }
inline vec2 floor(const vec2& a) { return vec2(std::floor(a.x), std::floor(a.y)); }
inline float ceil(float a) { return std::ceil(a); }
inline vec3 ceil(const vec3& a) { return vec3(std::ceil(a.x), std::ceil(a.y), std::ceil(a.z)); }
inline float sin(float a) { return std::sin(a); }
inline float cos(float a) { return std::cos(a); }
inline float tan(float a) { return std::tan(a); }
inline float asin(float a) { return std::asin(a); }
inline float acos(float a) { return std::acos(a); }
inline float atan(float a) { return std::atan(a); }
inline float atan(float y, float x) { return std::atan2(y, x); }
inline float exp(float a) { return std::exp(a); }
inline float log(float a) { return std::log(a); }
inline float pow(float a, float b) { return std::pow(a, b); }
inline vec3 pow(const vec3& a, const vec3& b) {
    return vec3(std::pow(a.x, b.x), std::pow(a.y, b.y), std::pow(a.z, b.z));
}

inline float mix(float x, float y, float a) { return x * (1.f - a) + y * a; }
inline vec3 mix(const vec3& x, const vec3& y, float a) { return x * (1.f - a) + y * a; }
inline float fract(float x) { return x - std::floor(x); }
inline float mod(float x, float y) { return x - y * std::floor(x / y); }
inline float clamp(float x, float lo, float hi) { return min(max(x, lo), hi); }
inline int clamp(int x, int lo, int hi) { return min(max(x, lo), hi); }
inline vec3 clamp(const vec3& x, const vec3& lo, const vec3& hi) { return min(max(x, lo), hi); }
inline vec3 clamp(const vec3& x, float lo, float hi) { return min(max(x, vec3(lo)), vec3(hi)); }
inline float radians(float deg) { return deg * 0.01745329251994329576923690768489f; }

// ---- gtc/constants
template <typename T> T pi() { return T(3.14159265358979323846264338327950288); }
template <typename T> T two_pi() { return T(6.28318530717958647692528676655900576); }
template <typename T> T half_pi() { return T(1.57079632679489661923132169163975144); }
template <typename T> T one_over_pi() { return T(0.318309886183790671537767526745028724); }
template <typename T> T one_over_two_pi() { return T(0.159154943091895335768883763372514362); }
template <typename T> T epsilon() { return std::numeric_limits<T>::epsilon(); }

}  // namespace glm
