// Zero-copy mmap safetensors reader.
//
// Native runtime component of easykv-tpu: loading a multi-GB checkpoint
// through Python (json + per-tensor copies) costs seconds and doubles peak
// host RSS; this maps the file once and exposes tensor views directly into
// the page cache. Python binds via ctypes (easykv_tpu/native/loader.py) and
// wraps the pointers as numpy arrays without copying; jax.device_put streams
// straight from the mapping to HBM.
//
// File format (https://github.com/huggingface/safetensors):
//   u64 little-endian header length N, then N bytes of JSON
//   { "tensor_name": {"dtype": "F32", "shape": [..], "data_offsets": [a, b]},
//     ..., "__metadata__": {...}? }
//   followed by the raw tensor bytes (offsets relative to the data section).
//
// The bundled minimal JSON parser supports exactly the safetensors header
// subset: objects, arrays, strings with escapes, and unsigned integers.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct TensorInfo {
  std::string name;
  std::string dtype;
  std::vector<int64_t> shape;
  uint64_t begin = 0;
  uint64_t end = 0;
};

struct File {
  int fd = -1;
  const uint8_t* base = nullptr;  // whole mapping
  size_t size = 0;
  const uint8_t* data = nullptr;  // start of the tensor data section
  std::vector<TensorInfo> tensors;
  std::unordered_map<std::string, size_t> index;
  std::string error;
};

// --- minimal JSON parsing (header subset) ---------------------------------

struct Parser {
  const char* p;
  const char* end;
  bool ok = true;

  void skip_ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) p++;
  }
  bool consume(char c) {
    skip_ws();
    if (p < end && *p == c) { p++; return true; }
    ok = false;
    return false;
  }
  bool peek(char c) {
    skip_ws();
    return p < end && *p == c;
  }
  std::string parse_string() {
    skip_ws();
    std::string out;
    if (p >= end || *p != '"') { ok = false; return out; }
    p++;
    while (p < end && *p != '"') {
      if (*p == '\\' && p + 1 < end) {
        p++;
        switch (*p) {
          case 'n': out.push_back('\n'); break;
          case 't': out.push_back('\t'); break;
          case 'r': out.push_back('\r'); break;
          case 'u':  // \uXXXX: keep raw (names in practice are ASCII)
            if (p + 4 < end) { out.append(p - 1, 6); p += 4; }
            break;
          default: out.push_back(*p);
        }
      } else {
        out.push_back(*p);
      }
      p++;
    }
    if (p >= end) { ok = false; return out; }
    p++;  // closing quote
    return out;
  }
  uint64_t parse_uint() {
    skip_ws();
    uint64_t v = 0;
    bool any = false;
    while (p < end && *p >= '0' && *p <= '9') {
      v = v * 10 + (*p - '0');
      p++;
      any = true;
    }
    if (!any) ok = false;
    return v;
  }
  // Skip any JSON value (used for __metadata__ entries).
  void skip_value() {
    skip_ws();
    if (p >= end) { ok = false; return; }
    if (*p == '"') { parse_string(); return; }
    if (*p == '{') {
      p++;
      skip_ws();
      if (peek('}')) { p++; return; }
      while (ok) {
        parse_string();
        if (!consume(':')) return;
        skip_value();
        skip_ws();
        if (peek(',')) { p++; continue; }
        consume('}');
        return;
      }
      return;
    }
    if (*p == '[') {
      p++;
      skip_ws();
      if (peek(']')) { p++; return; }
      while (ok) {
        skip_value();
        skip_ws();
        if (peek(',')) { p++; continue; }
        consume(']');
        return;
      }
      return;
    }
    // number / true / false / null
    while (p < end && *p != ',' && *p != '}' && *p != ']') p++;
  }
};

bool parse_header(File* f, const char* json, size_t len) {
  Parser ps{json, json + len};
  if (!ps.consume('{')) { f->error = "header: expected {"; return false; }
  if (ps.peek('}')) return true;
  while (ps.ok) {
    std::string name = ps.parse_string();
    if (!ps.consume(':')) break;
    if (name == "__metadata__") {
      ps.skip_value();
    } else {
      TensorInfo t;
      t.name = name;
      if (!ps.consume('{')) break;
      while (ps.ok && !ps.peek('}')) {
        std::string key = ps.parse_string();
        if (!ps.consume(':')) break;
        if (key == "dtype") {
          t.dtype = ps.parse_string();
        } else if (key == "shape") {
          if (!ps.consume('[')) break;
          if (!ps.peek(']')) {
            while (ps.ok) {
              t.shape.push_back(static_cast<int64_t>(ps.parse_uint()));
              if (ps.peek(',')) { ps.p++; continue; }
              break;
            }
          }
          if (!ps.consume(']')) break;
        } else if (key == "data_offsets") {
          if (!ps.consume('[')) break;
          t.begin = ps.parse_uint();
          if (!ps.consume(',')) break;
          t.end = ps.parse_uint();
          if (!ps.consume(']')) break;
        } else {
          ps.skip_value();
        }
        if (ps.peek(',')) ps.p++;
      }
      if (!ps.consume('}')) break;
      f->index[t.name] = f->tensors.size();
      f->tensors.push_back(std::move(t));
    }
    if (ps.peek(',')) { ps.p++; continue; }
    ps.consume('}');
    break;
  }
  if (!ps.ok) f->error = "header: malformed JSON";
  return ps.ok;
}

}  // namespace

extern "C" {

void* st_open(const char* path) {
  File* f = new File();
  f->fd = open(path, O_RDONLY);
  if (f->fd < 0) { f->error = "open failed"; return f; }
  struct stat st;
  if (fstat(f->fd, &st) != 0 || st.st_size < 8) {
    f->error = "stat failed or file too small";
    return f;
  }
  f->size = static_cast<size_t>(st.st_size);
  void* m = mmap(nullptr, f->size, PROT_READ, MAP_PRIVATE, f->fd, 0);
  if (m == MAP_FAILED) { f->error = "mmap failed"; return f; }
  f->base = static_cast<const uint8_t*>(m);
  uint64_t hlen;
  std::memcpy(&hlen, f->base, 8);  // little-endian host assumed (x86/ARM/TPU VMs)
  // NB: compare as `hlen > size - 8` (size >= 8 is already guaranteed) —
  // `8 + hlen` can wrap for a corrupt/malicious hlen near UINT64_MAX.
  if (hlen > f->size - 8) { f->error = "header length out of range"; return f; }
  if (!parse_header(f, reinterpret_cast<const char*>(f->base + 8), hlen)) return f;
  f->data = f->base + 8 + hlen;
  const size_t data_size = f->size - 8 - hlen;
  for (const auto& t : f->tensors) {
    if (t.end < t.begin || t.end > data_size) {
      f->error = "tensor '" + t.name + "' offsets out of range";
      return f;
    }
  }
  return f;
}

const char* st_error(void* h) {
  File* f = static_cast<File*>(h);
  return f->error.empty() ? nullptr : f->error.c_str();
}

int64_t st_num_tensors(void* h) {
  return static_cast<int64_t>(static_cast<File*>(h)->tensors.size());
}

const char* st_tensor_name(void* h, int64_t i) {
  File* f = static_cast<File*>(h);
  if (i < 0 || i >= static_cast<int64_t>(f->tensors.size())) return nullptr;
  return f->tensors[i].name.c_str();
}

// Returns ndim (or -1), fills dtype (caller buffer >= 16), shape[max 8],
// and nbytes.
int st_tensor_info(void* h, const char* name, char* dtype_out,
                   int64_t* shape_out, int64_t* nbytes_out) {
  File* f = static_cast<File*>(h);
  auto it = f->index.find(name);
  if (it == f->index.end()) return -1;
  const TensorInfo& t = f->tensors[it->second];
  std::snprintf(dtype_out, 16, "%s", t.dtype.c_str());
  if (t.shape.size() > 8) return -1;
  for (size_t i = 0; i < t.shape.size(); i++) shape_out[i] = t.shape[i];
  *nbytes_out = static_cast<int64_t>(t.end - t.begin);
  return static_cast<int>(t.shape.size());
}

const void* st_tensor_data(void* h, const char* name) {
  File* f = static_cast<File*>(h);
  auto it = f->index.find(name);
  if (it == f->index.end()) return nullptr;
  return f->data + f->tensors[it->second].begin;
}

void st_close(void* h) {
  File* f = static_cast<File*>(h);
  if (f->base) munmap(const_cast<uint8_t*>(f->base), f->size);
  if (f->fd >= 0) close(f->fd);
  delete f;
}

}  // extern "C"
