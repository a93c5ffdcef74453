// Offline STL -> PNG preview renderer (native C++).
//
// Replaces the reference's Go tool (ref docs/render.go): same camera
// (orthographic eye (3,3,3) -> origin, up +Z, frustum [-2,2], near 1 far
// 10 -- ref docs/render.go:13-36,63-64), same 1024^2 output at 4x
// supersampling, Phong-shaded model plus an RGB axis triad, transparent
// background -- so regenerated doc images are directly comparable with the
// reference's.  Software rasterizer with a z-buffer; multi-threaded over
// scanline bands; PNG output through zlib.
//
// Usage: render input.stl output.png

#include <zlib.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

struct Vec {
  double x = 0, y = 0, z = 0;
  Vec operator+(const Vec& o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec operator-(const Vec& o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec operator*(double s) const { return {x * s, y * s, z * s}; }
  Vec mul(const Vec& o) const { return {x * o.x, y * o.y, z * o.z}; }
  double dot(const Vec& o) const { return x * o.x + y * o.y + z * o.z; }
  Vec cross(const Vec& o) const {
    return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
  }
  double len() const { return std::sqrt(dot(*this)); }
  Vec norm() const {
    double l = len();
    return l > 0 ? *this * (1.0 / l) : *this;
  }
};

struct Mat {
  double m[4][4] = {};
  static Mat identity() {
    Mat r;
    for (int i = 0; i < 4; i++) r.m[i][i] = 1;
    return r;
  }
  Mat operator*(const Mat& o) const {
    Mat r;
    for (int i = 0; i < 4; i++)
      for (int j = 0; j < 4; j++)
        for (int k = 0; k < 4; k++) r.m[i][j] += m[i][k] * o.m[k][j];
    return r;
  }
  Vec mulPoint(const Vec& v) const {
    double w = m[3][0] * v.x + m[3][1] * v.y + m[3][2] * v.z + m[3][3];
    return {(m[0][0] * v.x + m[0][1] * v.y + m[0][2] * v.z + m[0][3]) / w,
            (m[1][0] * v.x + m[1][1] * v.y + m[1][2] * v.z + m[1][3]) / w,
            (m[2][0] * v.x + m[2][1] * v.y + m[2][2] * v.z + m[2][3]) / w};
  }
};

// Right-handed look-at view matrix (camera at eye, -z forward).
static Mat lookAt(Vec eye, Vec center, Vec up) {
  Vec f = (center - eye).norm();
  Vec s = f.cross(up).norm();
  Vec u = s.cross(f);
  Mat r = Mat::identity();
  r.m[0][0] = s.x; r.m[0][1] = s.y; r.m[0][2] = s.z;
  r.m[1][0] = u.x; r.m[1][1] = u.y; r.m[1][2] = u.z;
  r.m[2][0] = -f.x; r.m[2][1] = -f.y; r.m[2][2] = -f.z;
  r.m[0][3] = -s.dot(eye);
  r.m[1][3] = -u.dot(eye);
  r.m[2][3] = f.dot(eye);
  return r;
}

static Mat orthographic(double l, double r_, double b, double t, double n,
                        double f) {
  Mat r = Mat::identity();
  r.m[0][0] = 2 / (r_ - l);
  r.m[1][1] = 2 / (t - b);
  r.m[2][2] = -2 / (f - n);
  r.m[0][3] = -(r_ + l) / (r_ - l);
  r.m[1][3] = -(t + b) / (t - b);
  r.m[2][3] = -(f + n) / (f - n);
  return r;
}

static Mat scale(Vec s) {
  Mat r = Mat::identity();
  r.m[0][0] = s.x; r.m[1][1] = s.y; r.m[2][2] = s.z;
  return r;
}

static Mat translate(Vec t) {
  Mat r = Mat::identity();
  r.m[0][3] = t.x; r.m[1][3] = t.y; r.m[2][3] = t.z;
  return r;
}

// Rotation taking unit vector a onto unit vector b (axis-angle).
static Mat rotateTo(Vec a, Vec b) {
  Vec v = a.cross(b);
  double c = a.dot(b);
  Mat r = Mat::identity();
  if (v.len() < 1e-12) {
    if (c > 0) return r;
    // 180 degrees: R = 2*vv^T - I about any axis v perpendicular to a.
    Vec p = std::fabs(a.x) < 0.9 ? Vec{1, 0, 0} : Vec{0, 1, 0};
    v = a.cross(p).norm();
    for (int i = 0; i < 3; i++)
      for (int j = 0; j < 3; j++) {
        double vi = i == 0 ? v.x : i == 1 ? v.y : v.z;
        double vj = j == 0 ? v.x : j == 1 ? v.y : v.z;
        r.m[i][j] = 2 * vi * vj - (i == j ? 1.0 : 0.0);
      }
    return r;
  }
  double k = (1 - c) / v.dot(v);
  double K[3][3] = {{0, -v.z, v.y}, {v.z, 0, -v.x}, {-v.y, v.x, 0}};
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) {
      double kk = 0;
      for (int l = 0; l < 3; l++) kk += K[i][l] * K[l][j];
      r.m[i][j] = (i == j ? 1.0 : 0.0) + K[i][j] + kk * k;
    }
  return r;
}

struct Vertex {
  Vec pos;     // world space
  Vec normal;  // world space (unit)
};

struct Tri {
  Vertex v[3];
};

struct Color {
  double r = 0, g = 0, b = 0, a = 0;
};

static Color hexColor(uint32_t rgb) {
  return {((rgb >> 16) & 0xff) / 255.0, ((rgb >> 8) & 0xff) / 255.0,
          (rgb & 0xff) / 255.0, 1.0};
}

struct Shader {
  Mat matrix;
  Vec light;  // unit direction toward light
  Vec eye;
  Color object, ambient, diffuse, specular;
  double specularPower = 0;

  Color shade(const Vec& pos, const Vec& n) const {
    Color c{object.r * ambient.r, object.g * ambient.g, object.b * ambient.b,
            1.0};
    double d = std::max(0.0, n.dot(light));
    c.r += object.r * diffuse.r * d;
    c.g += object.g * diffuse.g * d;
    c.b += object.b * diffuse.b * d;
    if (specularPower > 0) {
      // Blinn-Phong half-vector specular, white highlight.
      Vec view = (eye - pos).norm();
      Vec h = (light + view).norm();
      double s = std::pow(std::max(0.0, n.dot(h)), specularPower);
      c.r += specular.r * s;
      c.g += specular.g * s;
      c.b += specular.b * s;
    }
    c.r = std::min(c.r, 1.0);
    c.g = std::min(c.g, 1.0);
    c.b = std::min(c.b, 1.0);
    return c;
  }
};

struct Context {
  int w, h;
  std::vector<double> zbuf;
  std::vector<Color> color;
  Context(int w_, int h_) : w(w_), h(h_), zbuf(w_ * h_, 1e30), color(w_ * h_) {}

  void draw(const std::vector<Tri>& tris, const Shader& sh) {
    int nthreads = std::max(1u, std::thread::hardware_concurrency());
    std::vector<std::thread> pool;
    for (int t = 0; t < nthreads; t++) {
      pool.emplace_back([&, t] {
        // Each thread owns a horizontal band: no pixel races.
        int y0 = (long long)h * t / nthreads;
        int y1 = (long long)h * (t + 1) / nthreads;
        for (const Tri& tri : tris) drawTri(tri, sh, y0, y1);
      });
    }
    for (auto& th : pool) th.join();
  }

  void drawTri(const Tri& t, const Shader& sh, int ymin, int ymax) {
    // Project to screen space.
    Vec p[3];
    for (int i = 0; i < 3; i++) {
      Vec ndc = sh.matrix.mulPoint(t.v[i].pos);
      p[i] = {(ndc.x + 1) * 0.5 * w, (1 - ndc.y) * 0.5 * h, ndc.z};
    }
    double area = (p[1].x - p[0].x) * (p[2].y - p[0].y) -
                  (p[2].x - p[0].x) * (p[1].y - p[0].y);
    if (std::fabs(area) < 1e-12) return;
    int x0 = std::max(0, (int)std::floor(std::min({p[0].x, p[1].x, p[2].x})));
    int x1 = std::min(w - 1, (int)std::ceil(std::max({p[0].x, p[1].x, p[2].x})));
    int y0 = std::max(ymin, (int)std::floor(std::min({p[0].y, p[1].y, p[2].y})));
    int y1 = std::min(ymax - 1, (int)std::ceil(std::max({p[0].y, p[1].y, p[2].y})));
    double inv = 1.0 / area;
    for (int y = y0; y <= y1; y++) {
      for (int x = x0; x <= x1; x++) {
        double px = x + 0.5, py = y + 0.5;
        double w0 = ((p[1].x - px) * (p[2].y - py) - (p[2].x - px) * (p[1].y - py)) * inv;
        double w1 = ((p[2].x - px) * (p[0].y - py) - (p[0].x - px) * (p[2].y - py)) * inv;
        double w2 = 1 - w0 - w1;
        if (w0 < 0 || w1 < 0 || w2 < 0) continue;
        double z = w0 * p[0].z + w1 * p[1].z + w2 * p[2].z;
        if (z < -1 || z > 1) continue;
        int idx = y * w + x;
        if (z >= zbuf[idx]) continue;
        zbuf[idx] = z;
        Vec pos = t.v[0].pos * w0 + t.v[1].pos * w1 + t.v[2].pos * w2;
        Vec n = (t.v[0].normal * w0 + t.v[1].normal * w1 + t.v[2].normal * w2)
                    .norm();
        color[idx] = sh.shade(pos, n);
      }
    }
  }
};

// --- mesh loading / generation ---------------------------------------------

static std::vector<Tri> loadSTL(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) { std::fprintf(stderr, "cannot open %s\n", path); std::exit(1); }
  uint8_t header[80];
  if (std::fread(header, 1, 80, f) != 80) std::exit(1);
  uint32_t n;
  if (std::fread(&n, 4, 1, f) != 1) std::exit(1);
  std::vector<Tri> tris(n);
  for (uint32_t i = 0; i < n; i++) {
    float rec[12];
    uint16_t attr;
    if (std::fread(rec, 4, 12, f) != 12 || std::fread(&attr, 2, 1, f) != 1)
      std::exit(1);
    Vec a{rec[3], rec[4], rec[5]}, b{rec[6], rec[7], rec[8]},
        c{rec[9], rec[10], rec[11]};
    Vec fn = (b - a).cross(c - a).norm();  // recompute: flat shading
    tris[i] = {{{a, fn}, {b, fn}, {c, fn}}};
  }
  std::fclose(f);
  return tris;
}

static void transform(std::vector<Tri>& tris, const Mat& m, const Mat& nm) {
  for (Tri& t : tris)
    for (int i = 0; i < 3; i++) {
      t.v[i].pos = m.mulPoint(t.v[i].pos);
      Vec n = t.v[i].normal;
      t.v[i].normal =
          Vec{nm.m[0][0] * n.x + nm.m[0][1] * n.y + nm.m[0][2] * n.z,
              nm.m[1][0] * n.x + nm.m[1][1] * n.y + nm.m[1][2] * n.z,
              nm.m[2][0] * n.x + nm.m[2][1] * n.y + nm.m[2][2] * n.z}
              .norm();
    }
}

// Unit cylinder along z in [-1, 1], smooth side normals (ref render.go:87-92).
static std::vector<Tri> unitCylinder(int steps) {
  std::vector<Tri> tris;
  for (int i = 0; i < steps; i++) {
    double a0 = 2 * M_PI * i / steps, a1 = 2 * M_PI * (i + 1) / steps;
    Vec n0{std::cos(a0), std::sin(a0), 0}, n1{std::cos(a1), std::sin(a1), 0};
    Vec p00{n0.x, n0.y, -1}, p01{n1.x, n1.y, -1};
    Vec p10{n0.x, n0.y, 1}, p11{n1.x, n1.y, 1};
    tris.push_back({{{p00, n0}, {p01, n1}, {p11, n1}}});
    tris.push_back({{{p00, n0}, {p11, n1}, {p10, n0}}});
  }
  return tris;
}

// Unit cone: base circle r=1 at z=-1, apex at z=+1 (ref render.go:94-99).
static std::vector<Tri> unitCone(int steps) {
  std::vector<Tri> tris;
  double ny = 1.0 / std::sqrt(5.0), nr = 2.0 / std::sqrt(5.0);
  for (int i = 0; i < steps; i++) {
    double a0 = 2 * M_PI * i / steps, a1 = 2 * M_PI * (i + 1) / steps;
    double am = (a0 + a1) / 2;
    Vec n0{nr * std::cos(a0), nr * std::sin(a0), ny};
    Vec n1{nr * std::cos(a1), nr * std::sin(a1), ny};
    Vec nm{nr * std::cos(am), nr * std::sin(am), ny};
    Vec p0{std::cos(a0), std::sin(a0), -1}, p1{std::cos(a1), std::sin(a1), -1};
    Vec apex{0, 0, 1};
    tris.push_back({{{p0, n0}, {p1, n1}, {apex, nm}}});
  }
  return tris;
}

static std::vector<Tri> unitSphere(int subdiv) {
  // UV sphere with smooth normals (origin marker, ref render.go:101-105).
  std::vector<Tri> tris;
  int n = 8 << subdiv;
  for (int i = 0; i < n; i++) {
    for (int j = 0; j < n / 2; j++) {
      double u0 = 2 * M_PI * i / n, u1 = 2 * M_PI * (i + 1) / n;
      double v0 = M_PI * j / (n / 2) - M_PI / 2,
             v1 = M_PI * (j + 1) / (n / 2) - M_PI / 2;
      auto at = [](double u, double v) {
        return Vec{std::cos(v) * std::cos(u), std::cos(v) * std::sin(u),
                   std::sin(v)};
      };
      Vec a = at(u0, v0), b = at(u1, v0), c = at(u1, v1), d = at(u0, v1);
      tris.push_back({{{a, a}, {b, b}, {c, c}}});
      tris.push_back({{{a, a}, {c, c}, {d, d}}});
    }
  }
  return tris;
}

// --- PNG writing ------------------------------------------------------------

static void put32(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back(x >> 24); v.push_back(x >> 16); v.push_back(x >> 8);
  v.push_back(x);
}

static void chunk(FILE* f, const char* type, const std::vector<uint8_t>& data) {
  std::vector<uint8_t> full;
  full.insert(full.end(), type, type + 4);
  full.insert(full.end(), data.begin(), data.end());
  uint32_t len = data.size();
  uint8_t lenb[4] = {(uint8_t)(len >> 24), (uint8_t)(len >> 16),
                     (uint8_t)(len >> 8), (uint8_t)len};
  std::fwrite(lenb, 1, 4, f);
  std::fwrite(full.data(), 1, full.size(), f);
  uint32_t crc = crc32(0, full.data(), full.size());
  uint8_t crcb[4] = {(uint8_t)(crc >> 24), (uint8_t)(crc >> 16),
                     (uint8_t)(crc >> 8), (uint8_t)crc};
  std::fwrite(crcb, 1, 4, f);
}

static void writePNG(const char* path, const std::vector<uint8_t>& rgba, int w,
                     int h) {
  std::vector<uint8_t> raw;
  raw.reserve((size_t)h * (w * 4 + 1));
  for (int y = 0; y < h; y++) {
    raw.push_back(0);  // filter: none
    raw.insert(raw.end(), rgba.begin() + (size_t)y * w * 4,
               rgba.begin() + (size_t)(y + 1) * w * 4);
  }
  uLongf clen = compressBound(raw.size());
  std::vector<uint8_t> comp(clen);
  if (compress2(comp.data(), &clen, raw.data(), raw.size(), 6) != Z_OK)
    std::exit(1);
  comp.resize(clen);

  FILE* f = std::fopen(path, "wb");
  if (!f) { std::fprintf(stderr, "cannot write %s\n", path); std::exit(1); }
  const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  std::fwrite(sig, 1, 8, f);
  std::vector<uint8_t> ihdr;
  put32(ihdr, w);
  put32(ihdr, h);
  ihdr.push_back(8);   // bit depth
  ihdr.push_back(6);   // RGBA
  ihdr.push_back(0); ihdr.push_back(0); ihdr.push_back(0);
  chunk(f, "IHDR", ihdr);
  chunk(f, "IDAT", comp);
  chunk(f, "IEND", {});
  std::fclose(f);
}

// ----------------------------------------------------------------------------

int main(int argc, char** argv) {
  if (argc != 3) {
    std::fprintf(stderr, "Usage: render input.stl output.png\n");
    return 1;
  }
  const int AA = 4, W = 1024, H = 1024;
  const Vec eye{3, 3, 3}, center{0, 0, 0}, up{0, 0, 1};

  std::vector<Tri> mesh = loadSTL(argv[1]);

  // Scale to fit the bi-unit cube, no translation (ref render.go:52-57).
  Vec lo{1e30, 1e30, 1e30}, hi{-1e30, -1e30, -1e30};
  for (const Tri& t : mesh)
    for (int i = 0; i < 3; i++) {
      const Vec& p = t.v[i].pos;
      lo = {std::min(lo.x, p.x), std::min(lo.y, p.y), std::min(lo.z, p.z)};
      hi = {std::max(hi.x, p.x), std::max(hi.y, p.y), std::max(hi.z, p.z)};
    }
  Vec m{std::max(std::fabs(lo.x), std::fabs(hi.x)),
        std::max(std::fabs(lo.y), std::fabs(hi.y)),
        std::max(std::fabs(lo.z), std::fabs(hi.z))};
  double s = std::min({1 / m.x, 1 / m.y, 1 / m.z});
  transform(mesh, scale({s, s, s}), Mat::identity());

  Mat matrix = orthographic(-2, 2, -2, 2, 1, 10) * lookAt(eye, center, up);
  Context ctx(W * AA, H * AA);

  // Axis triad + origin (ref render.go:66-105).
  {
    Shader sh;
    sh.matrix = matrix;
    sh.light = Vec{1, 1, 1}.norm();
    sh.eye = eye;
    sh.ambient = {0.4, 0.4, 0.4, 1};
    sh.diffuse = {0.7, 0.7, 0.7, 1};
    sh.specular = {0, 0, 0, 1};
    Vec axes[3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
    Color colors[3] = {hexColor(0xBF1506), hexColor(0x5ABF56),
                       hexColor(0x1B52BF)};
    for (int i = 0; i < 3; i++) {
      sh.object = colors[i];
      auto cyl = unitCylinder(30);
      Mat mm = rotateTo(up, axes[i]) * translate({0, 0, 1}) *
               scale({0.01, 0.01, 2});
      transform(cyl, mm, rotateTo(up, axes[i]));
      ctx.draw(cyl, sh);
      auto cone = unitCone(30);
      mm = rotateTo(up, axes[i]) * translate({0, 0, 2}) *
           scale({0.03, 0.03, 0.1});
      transform(cone, mm, rotateTo(up, axes[i]));
      ctx.draw(cone, sh);
    }
    sh.object = hexColor(0x333333);
    auto sph = unitSphere(2);
    transform(sph, scale({0.025, 0.025, 0.025}), Mat::identity());
    ctx.draw(sph, sh);
  }

  // Model (ref render.go:107-120).
  {
    Shader sh;
    sh.matrix = matrix;
    sh.light = Vec{0.75, 0.25, 1}.norm();
    sh.eye = eye;
    sh.object = hexColor(0x2185C5);
    sh.ambient = {0.3, 0.3, 0.3, 1};
    sh.diffuse = {0.9, 0.9, 0.9, 1};
    sh.specular = {0.2, 0.2, 0.2, 1};
    sh.specularPower = 10;
    ctx.draw(mesh, sh);
  }

  // Box-downsample AA x AA -> output, straight-alpha RGBA.
  std::vector<uint8_t> out((size_t)W * H * 4);
  for (int y = 0; y < H; y++) {
    for (int x = 0; x < W; x++) {
      double r = 0, g = 0, b = 0, a = 0;
      for (int dy = 0; dy < AA; dy++)
        for (int dx = 0; dx < AA; dx++) {
          size_t idx = (size_t)(y * AA + dy) * (W * AA) + (x * AA + dx);
          const Color& c = ctx.color[idx];
          r += c.r * c.a; g += c.g * c.a; b += c.b * c.a; a += c.a;
        }
      double inv = a > 0 ? 1.0 / a : 0;
      size_t o = ((size_t)y * W + x) * 4;
      out[o + 0] = (uint8_t)std::lround(r * inv * 255);
      out[o + 1] = (uint8_t)std::lround(g * inv * 255);
      out[o + 2] = (uint8_t)std::lround(b * inv * 255);
      out[o + 3] = (uint8_t)std::lround(a / (AA * AA) * 255);
    }
  }
  writePNG(argv[2], out, W, H);
  std::printf("%zu triangles -> %s\n", mesh.size(), argv[2]);
  return 0;
}
