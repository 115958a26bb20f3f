// Fast OBJ geometry parser for chameleonrt-tpu.
//
// Plays the role tinyobjloader plays for the reference
// (/root/reference/util/scene.cpp:94-186): stream the file once, triangulate
// polygon faces as fans, split shapes on o/g groups, and remap each shape's
// (v, vn, vt) index triples to packed single-index vertices with a hash map.
// Exposed through a plain C ABI consumed via ctypes (no pybind11 in the
// image). Material resolution (MTL parsing, texture loading) stays in
// Python; shapes report their material *name* and the mtllib list is
// surfaced verbatim.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Triple {
    int32_t v, n, t;
    bool operator==(const Triple &o) const { return v == o.v && n == o.n && t == o.t; }
};

struct TripleHash {
    size_t operator()(const Triple &k) const {
        // 64-bit mix of the three indices
        uint64_t h = 1469598103934665603ull;
        auto mix = [&h](uint64_t x) {
            h ^= x + 0x9e3779b97f4a7c15ull + (h << 6) + (h >> 2);
        };
        mix(static_cast<uint32_t>(k.v));
        mix(static_cast<uint32_t>(k.n));
        mix(static_cast<uint32_t>(k.t));
        return static_cast<size_t>(h);
    }
};

struct Shape {
    std::vector<float> verts;     // packed xyz
    std::vector<float> normals;   // packed xyz (normalized), may be empty
    std::vector<float> uvs;       // packed uv, may be empty
    std::vector<uint32_t> tris;   // 3 indices per triangle
    std::string material;         // first usemtl seen for this shape's faces
    bool mixed_materials = false; // warn flag (reference scene.cpp:133-139)
    std::unordered_map<Triple, uint32_t, TripleHash> remap;
};

struct ObjFile {
    std::vector<Shape> shapes;
    std::vector<std::string> mtllibs;
    std::string error;
};

inline const char *skip_ws(const char *p, const char *end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    return p;
}

inline const char *next_line(const char *p, const char *end) {
    while (p < end && *p != '\n') ++p;
    return p < end ? p + 1 : end;
}

inline float parse_float(const char *&p, const char *end) {
    char *out = nullptr;
    float v = strtof(p, &out);
    p = out ? out : p;
    (void)end;
    return v;
}

inline int32_t parse_int(const char *&p) {
    char *out = nullptr;
    long v = strtol(p, &out, 10);
    p = out ? out : p;
    return static_cast<int32_t>(v);
}

}  // namespace

extern "C" {

ObjFile *crt_obj_parse(const char *path) {
    auto *obj = new ObjFile();
    FILE *f = fopen(path, "rb");
    if (!f) {
        obj->error = std::string("cannot open ") + path;
        return obj;
    }
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::string data;
    data.resize(static_cast<size_t>(size));
    if (size > 0 && fread(&data[0], 1, static_cast<size_t>(size), f) != (size_t)size) {
        obj->error = std::string("short read on ") + path;
        fclose(f);
        return obj;
    }
    fclose(f);

    std::vector<float> vx;  // positions xyz
    std::vector<float> nx;  // normals xyz
    std::vector<float> tx;  // texcoords uv
    obj->shapes.emplace_back();
    std::string cur_mtl;
    bool shape_has_mtl = false;
    std::vector<Triple> face;  // reused per face

    const char *p = data.data();
    const char *end = p + data.size();
    while (p < end) {
        p = skip_ws(p, end);
        const char *line_end = p;
        while (line_end < end && *line_end != '\n') ++line_end;

        if (p >= end) break;
        if (p[0] == 'v' && p + 1 < end && p[1] == ' ') {
            p += 2;
            float a = parse_float(p, end);
            float b = parse_float(p, end);
            float c = parse_float(p, end);
            vx.push_back(a); vx.push_back(b); vx.push_back(c);
        } else if (p[0] == 'v' && p + 1 < end && p[1] == 'n') {
            p += 3;
            float a = parse_float(p, end);
            float b = parse_float(p, end);
            float c = parse_float(p, end);
            nx.push_back(a); nx.push_back(b); nx.push_back(c);
        } else if (p[0] == 'v' && p + 1 < end && p[1] == 't') {
            p += 3;
            float a = parse_float(p, end);
            p = skip_ws(p, end);
            float b = (p < line_end && *p != '\n') ? parse_float(p, end) : 0.f;
            tx.push_back(a); tx.push_back(b);
        } else if (p[0] == 'f' && p + 1 < end && (p[1] == ' ' || p[1] == '\t')) {
            p += 2;
            face.clear();
            const long nv = static_cast<long>(vx.size() / 3);
            const long nn = static_cast<long>(nx.size() / 3);
            const long nt = static_cast<long>(tx.size() / 2);
            while (true) {
                p = skip_ws(p, end);
                if (p >= line_end || *p == '\n' || *p == '#') break;
                Triple tr{-1, -1, -1};
                int32_t vi = parse_int(p);
                tr.v = vi > 0 ? vi - 1 : static_cast<int32_t>(nv + vi);
                if (p < line_end && *p == '/') {
                    ++p;
                    if (p < line_end && *p != '/') {
                        int32_t ti = parse_int(p);
                        tr.t = ti > 0 ? ti - 1 : static_cast<int32_t>(nt + ti);
                    }
                    if (p < line_end && *p == '/') {
                        ++p;
                        int32_t ni = parse_int(p);
                        tr.n = ni > 0 ? ni - 1 : static_cast<int32_t>(nn + ni);
                    }
                }
                if (tr.v < 0 || tr.v >= nv) { tr.v = 0; }
                face.push_back(tr);
            }
            if (face.size() >= 3) {
                Shape &s = obj->shapes.back();
                if (!shape_has_mtl) {
                    s.material = cur_mtl;
                    shape_has_mtl = true;
                } else if (s.material != cur_mtl) {
                    s.mixed_materials = true;
                }
                auto emit = [&](const Triple &tr) -> uint32_t {
                    auto it = s.remap.find(tr);
                    if (it != s.remap.end()) return it->second;
                    uint32_t id = static_cast<uint32_t>(s.verts.size() / 3);
                    s.remap.emplace(tr, id);
                    s.verts.push_back(vx[tr.v * 3]);
                    s.verts.push_back(vx[tr.v * 3 + 1]);
                    s.verts.push_back(vx[tr.v * 3 + 2]);
                    if (tr.n >= 0 && tr.n * 3 + 2 < (long)nx.size()) {
                        float a = nx[tr.n * 3], b = nx[tr.n * 3 + 1], c = nx[tr.n * 3 + 2];
                        float len = sqrtf(a * a + b * b + c * c);
                        if (len <= 0) len = 1.f;
                        s.normals.push_back(a / len);
                        s.normals.push_back(b / len);
                        s.normals.push_back(c / len);
                    }
                    if (tr.t >= 0 && tr.t * 2 + 1 < (long)tx.size()) {
                        s.uvs.push_back(tx[tr.t * 2]);
                        s.uvs.push_back(tx[tr.t * 2 + 1]);
                    }
                    return id;
                };
                uint32_t i0 = emit(face[0]);
                uint32_t prev = emit(face[1]);
                for (size_t k = 2; k < face.size(); ++k) {
                    uint32_t cur = emit(face[k]);
                    s.tris.push_back(i0);
                    s.tris.push_back(prev);
                    s.tris.push_back(cur);
                    prev = cur;
                }
            }
        } else if ((p[0] == 'o' || p[0] == 'g') && p + 1 < end &&
                   (p[1] == ' ' || p[1] == '\t' || p[1] == '\n' || p[1] == '\r')) {
            if (!obj->shapes.back().tris.empty()) {
                obj->shapes.emplace_back();
                shape_has_mtl = false;
            }
        } else if (!strncmp(p, "usemtl", 6)) {
            const char *q = skip_ws(p + 6, line_end);
            const char *e = line_end;
            while (e > q && (e[-1] == '\r' || e[-1] == ' ' || e[-1] == '\n')) --e;
            cur_mtl.assign(q, e);
        } else if (!strncmp(p, "mtllib", 6)) {
            const char *q = skip_ws(p + 6, line_end);
            const char *e = line_end;
            while (e > q && (e[-1] == '\r' || e[-1] == ' ' || e[-1] == '\n')) --e;
            if (e > q) obj->mtllibs.emplace_back(q, e);
        }
        p = next_line(line_end, end);
    }
    // drop a trailing empty shape
    if (obj->shapes.size() > 1 && obj->shapes.back().tris.empty()) {
        obj->shapes.pop_back();
    }
    return obj;
}

const char *crt_obj_error(ObjFile *o) { return o->error.c_str(); }

int32_t crt_obj_num_shapes(ObjFile *o) {
    return o->error.empty() ? static_cast<int32_t>(o->shapes.size()) : 0;
}

int32_t crt_obj_num_mtllibs(ObjFile *o) {
    return static_cast<int32_t>(o->mtllibs.size());
}

const char *crt_obj_mtllib(ObjFile *o, int32_t i) { return o->mtllibs[i].c_str(); }

void crt_obj_shape_counts(ObjFile *o, int32_t shape, int64_t *n_verts,
                          int64_t *n_tris, int32_t *has_normals,
                          int32_t *has_uvs, int32_t *mixed_materials) {
    const Shape &s = o->shapes[shape];
    *n_verts = static_cast<int64_t>(s.verts.size() / 3);
    *n_tris = static_cast<int64_t>(s.tris.size() / 3);
    *has_normals = s.normals.size() == s.verts.size() ? 1 : 0;
    *has_uvs = s.uvs.size() * 3 == s.verts.size() * 2 ? 1 : 0;
    *mixed_materials = s.mixed_materials ? 1 : 0;
}

const char *crt_obj_shape_material(ObjFile *o, int32_t shape) {
    return o->shapes[shape].material.c_str();
}

void crt_obj_shape_data(ObjFile *o, int32_t shape, float *verts, float *normals,
                        float *uvs, uint32_t *tris) {
    const Shape &s = o->shapes[shape];
    memcpy(verts, s.verts.data(), s.verts.size() * sizeof(float));
    if (normals && !s.normals.empty())
        memcpy(normals, s.normals.data(), s.normals.size() * sizeof(float));
    if (uvs && !s.uvs.empty())
        memcpy(uvs, s.uvs.data(), s.uvs.size() * sizeof(float));
    memcpy(tris, s.tris.data(), s.tris.size() * sizeof(uint32_t));
}

void crt_obj_free(ObjFile *o) { delete o; }

}  // extern "C"
