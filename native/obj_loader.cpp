// Native wavefront OBJ scanner.
//
// Fast path for the Python loader (tracy_tpu/scene/objloader.py), replacing
// the reference's tiny_obj_loader dependency (scene.cpp:12-13,471-526).
// Parses v/vn/vt/f records in one pass; faces are fan-triangulated; returns
// flat float/int arrays through a two-call size-then-fill C ABI.
//
//   int64 tracy_obj_scan(const char* path, int64 counts[4]);
//       counts = {num_v, num_vn, num_vt, num_face_corners(after fan)}
//       returns a handle id (>=0) or -1 on error. The parse result is cached
//       on the handle for the fill call.
//   int   tracy_obj_fill(int64 handle, float* v, float* vn, float* vt,
//                        int* f_v, int* f_vt, int* f_vn, int* shape_id);
//       arrays sized per counts; f_* are 0-based (-1 = absent);
//       shape_id[i] = which o/g-delimited shape each corner belongs to.
//   void  tracy_obj_free(int64 handle);

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <vector>

namespace {

struct ObjData {
  std::vector<float> v, vn, vt;
  std::vector<int> f_v, f_vt, f_vn, shape_id;
};

std::mutex g_mutex;
std::map<int64_t, ObjData*> g_handles;
int64_t g_next = 0;

// Parse "a/b/c", "a//c", "a/b", "a" into 1-based (or negative) indices.
inline void parse_corner(const char* tok, int& vi, int& ti, int& ni) {
  vi = ti = ni = 0;
  vi = static_cast<int>(strtol(tok, const_cast<char**>(&tok), 10));
  if (*tok == '/') {
    ++tok;
    if (*tok != '/') ti = static_cast<int>(strtol(tok, const_cast<char**>(&tok), 10));
    if (*tok == '/') {
      ++tok;
      ni = static_cast<int>(strtol(tok, const_cast<char**>(&tok), 10));
    }
  }
}

inline int fix_index(int raw, size_t count) {
  if (raw > 0) return raw - 1;
  if (raw < 0) return static_cast<int>(count) + raw;
  return -1;
}

}  // namespace

extern "C" int64_t tracy_obj_scan(const char* path, int64_t counts[4]) {
  FILE* fp = std::fopen(path, "r");
  if (!fp) return -1;

  auto* data = new ObjData();
  int shape = 0;
  bool shape_has_faces = false;

  char line[8192];
  std::vector<const char*> toks;
  while (std::fgets(line, sizeof line, fp)) {
    if (line[0] == 'v') {
      float a, b, c;
      if (line[1] == ' ') {
        if (std::sscanf(line + 2, "%f %f %f", &a, &b, &c) == 3) {
          data->v.push_back(a); data->v.push_back(b); data->v.push_back(c);
        }
      } else if (line[1] == 'n' && line[2] == ' ') {
        if (std::sscanf(line + 3, "%f %f %f", &a, &b, &c) == 3) {
          data->vn.push_back(a); data->vn.push_back(b); data->vn.push_back(c);
        }
      } else if (line[1] == 't' && line[2] == ' ') {
        if (std::sscanf(line + 3, "%f %f", &a, &b) == 2) {
          data->vt.push_back(a); data->vt.push_back(b);
        }
      }
    } else if (line[0] == 'f' && line[1] == ' ') {
      // Tokenize the face line.
      toks.clear();
      char* p = line + 2;
      while (*p) {
        while (*p == ' ' || *p == '\t') ++p;
        if (*p == '\0' || *p == '\n' || *p == '\r') break;
        toks.push_back(p);
        while (*p && *p != ' ' && *p != '\t' && *p != '\n' && *p != '\r') ++p;
        if (*p) *p++ = '\0';
      }
      const size_t n = toks.size();
      if (n < 3) continue;
      shape_has_faces = true;
      int c0[3], ck[3], ck1[3];
      parse_corner(toks[0], c0[0], c0[1], c0[2]);
      for (size_t k = 1; k + 1 < n; ++k) {
        parse_corner(toks[k], ck[0], ck[1], ck[2]);
        parse_corner(toks[k + 1], ck1[0], ck1[1], ck1[2]);
        const int* corners[3] = {c0, ck, ck1};
        for (int c = 0; c < 3; ++c) {
          data->f_v.push_back(fix_index(corners[c][0], data->v.size() / 3));
          data->f_vt.push_back(fix_index(corners[c][1], data->vt.size() / 2));
          data->f_vn.push_back(fix_index(corners[c][2], data->vn.size() / 3));
          data->shape_id.push_back(shape);
        }
      }
    } else if ((line[0] == 'o' || line[0] == 'g') && line[1] == ' ') {
      if (shape_has_faces) {
        ++shape;
        shape_has_faces = false;
      }
    }
  }
  std::fclose(fp);

  counts[0] = static_cast<int64_t>(data->v.size() / 3);
  counts[1] = static_cast<int64_t>(data->vn.size() / 3);
  counts[2] = static_cast<int64_t>(data->vt.size() / 2);
  counts[3] = static_cast<int64_t>(data->f_v.size());

  std::lock_guard<std::mutex> lock(g_mutex);
  const int64_t h = g_next++;
  g_handles[h] = data;
  return h;
}

extern "C" int tracy_obj_fill(int64_t handle, float* v, float* vn, float* vt,
                              int* f_v, int* f_vt, int* f_vn, int* shape_id) {
  ObjData* data;
  {
    std::lock_guard<std::mutex> lock(g_mutex);
    auto it = g_handles.find(handle);
    if (it == g_handles.end()) return -1;
    data = it->second;
  }
  std::memcpy(v, data->v.data(), data->v.size() * sizeof(float));
  std::memcpy(vn, data->vn.data(), data->vn.size() * sizeof(float));
  std::memcpy(vt, data->vt.data(), data->vt.size() * sizeof(float));
  std::memcpy(f_v, data->f_v.data(), data->f_v.size() * sizeof(int));
  std::memcpy(f_vt, data->f_vt.data(), data->f_vt.size() * sizeof(int));
  std::memcpy(f_vn, data->f_vn.data(), data->f_vn.size() * sizeof(int));
  std::memcpy(shape_id, data->shape_id.data(), data->shape_id.size() * sizeof(int));
  return 0;
}

extern "C" void tracy_obj_free(int64_t handle) {
  std::lock_guard<std::mutex> lock(g_mutex);
  auto it = g_handles.find(handle);
  if (it != g_handles.end()) {
    delete it->second;
    g_handles.erase(it);
  }
}
