/* Second-language consumer of the uvol_tpu C ABI (round-1 verdict item
 * 10): decodes a Draco .drc frame through libuvt_draco's whole-frame
 * entry points — the same FFI boundary a Unity/Android-class port would
 * use (reference: deprecated/encoder/dev/src/corto_codec.cpp:6-58,
 * CreateDecoder/DecodeMesh consumed via P/Invoke and JNI) — and prints
 * geometry counts plus FNV-1a checksums of every attribute payload so
 * the caller can diff against the Python decoder bit-for-bit.
 *
 * Build (the .so is the one uvol_tpu builds on import):
 *   python -c "import sys; sys.path.insert(0, '.'); \
 *              from uvol_tpu import native; print(native.get_draco_lib()._name)"
 *   gcc -O2 examples/consumer_demo.c -o /tmp/consumer_demo -ldl
 * Run:
 *   /tmp/consumer_demo <libuvt_draco.so> <frame.drc>
 */

#include <dlfcn.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef void* (*drc_decode_fn)(const uint8_t*, int64_t, int64_t*);
typedef int (*attr_info_fn)(void*, int, int64_t*);
typedef int (*attr_fetch_fn)(void*, int, void*, int32_t*);
typedef int (*points_fetch_fn)(void*, int32_t*);
typedef void (*free_fn)(void*);

static uint64_t fnv1a(const void* data, size_t n) {
  const uint8_t* p = (const uint8_t*)data;
  uint64_t h = 14695981039346656037ull;
  for (size_t i = 0; i < n; ++i) {
    h ^= p[i];
    h *= 1099511628211ull;
  }
  return h;
}

int main(int argc, char** argv) {
  if (argc != 3) {
    fprintf(stderr, "usage: %s <libuvt_draco.so> <frame.drc>\n", argv[0]);
    return 2;
  }
  void* lib = dlopen(argv[1], RTLD_NOW);
  if (!lib) {
    fprintf(stderr, "dlopen: %s\n", dlerror());
    return 2;
  }
  drc_decode_fn drc_decode = (drc_decode_fn)dlsym(lib, "uvt_drc_decode");
  attr_info_fn attr_info = (attr_info_fn)dlsym(lib, "uvt_drc_attr_info");
  attr_fetch_fn attr_fetch = (attr_fetch_fn)dlsym(lib, "uvt_drc_attr_fetch");
  points_fetch_fn points_fetch =
      (points_fetch_fn)dlsym(lib, "uvt_drc_points_fetch");
  free_fn drc_free = (free_fn)dlsym(lib, "uvt_drc_free");
  if (!drc_decode || !attr_info || !attr_fetch || !points_fetch || !drc_free) {
    fprintf(stderr, "missing uvt_drc_* symbols\n");
    return 2;
  }

  FILE* f = fopen(argv[2], "rb");
  if (!f) {
    perror("open");
    return 2;
  }
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  uint8_t* buf = (uint8_t*)malloc(len);
  if (fread(buf, 1, len, f) != (size_t)len) {
    perror("read");
    return 2;
  }
  fclose(f);

  int64_t info[4];
  void* h = drc_decode(buf, len, info);
  free(buf);
  if (!h || info[0] != 0) {
    fprintf(stderr, "decode rc=%lld\n", (long long)info[0]);
    return 1;
  }
  int64_t num_attrs = info[1], num_faces = info[2], num_points = info[3];
  printf("faces=%lld points=%lld attrs=%lld\n", (long long)num_faces,
         (long long)num_points, (long long)num_attrs);

  int32_t* corners = (int32_t*)malloc(3 * num_faces * sizeof(int32_t));
  if (points_fetch(h, corners) != 0) return 1;
  printf("connectivity fnv1a=%016llx\n",
         (unsigned long long)fnv1a(corners, 3 * num_faces * sizeof(int32_t)));
  free(corners);

  for (int i = 0; i < (int)num_attrs; ++i) {
    int64_t a[8];
    if (attr_info(h, i, a) != 0) return 1;
    int64_t n = a[6], stored = a[7];
    size_t bytes = (size_t)n * stored * (a[5] ? 4 : 8);
    void* vals = malloc(bytes);
    int32_t* cmap = (int32_t*)malloc(3 * num_faces * sizeof(int32_t));
    if (attr_fetch(h, i, vals, cmap) != 0) return 1;
    printf(
        "attr[%d] type=%lld comps=%lld values=%lld %s "
        "values_fnv1a=%016llx corner_map_fnv1a=%016llx\n",
        i, (long long)a[0], (long long)stored, (long long)n,
        a[5] ? "f32" : "i64", (unsigned long long)fnv1a(vals, bytes),
        (unsigned long long)fnv1a(cmap, 3 * num_faces * sizeof(int32_t)));
    free(vals);
    free(cmap);
  }
  drc_free(h);
  dlclose(lib);
  return 0;
}
