/* Native (Python-free) streaming player over the uvol_tpu C ABI.
 *
 * The reference shipped Unity and Android player ports
 * (deprecated/unity/Assets/UniversalVolumetricPlayer.cs:12,
 * deprecated/android/.../Actor.java:30) that consumed the corto codec
 * through P/Invoke and JNI (deprecated/encoder/dev/src/corto_codec.cpp:6-58).
 * This is the equivalent proof for uvol_tpu's boundary: a standalone C
 * program that runs a REAL streaming-player loop — worker decode thread,
 * bounded ring buffer, a 30 fps presentation clock, late-frame
 * accounting — entirely through libuvt_draco's whole-frame entry points.
 *
 * Architecture (mirrors the headless V1 player, uvol_tpu/player/v1.py):
 *   - a decoder pthread reads `%05d.drc` files and fills a ring buffer
 *     of decoded frames (bounded lookahead = 4, like the reference's
 *     <=3-in-flight fetch discipline, src/V1/player.ts:120-132);
 *   - the main thread is the render clock: every frame_duration it
 *     takes the next decoded frame, folds its position payload into a
 *     running FNV-1a checksum (the "upload to GPU" stand-in), and
 *     counts frames whose decode missed the presentation deadline.
 *
 * Build:
 *   gcc -O2 -pthread examples/native_player.c -o /tmp/native_player -ldl
 * Run:
 *   /tmp/native_player <libuvt_draco.so> <geometry_dir> [num_frames] [fps]
 *
 * Output (single line, machine-parseable):
 *   native_player frames=N late=K fps_wall=F decode_ms_mean=M fnv=HEX
 */

#include <dlfcn.h>
#include <pthread.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

typedef void* (*drc_decode_fn)(const uint8_t*, int64_t, int64_t*);
typedef int (*attr_info_fn)(void*, int, int64_t*);
typedef int (*attr_fetch_fn)(void*, int, void*, int32_t*);
typedef void (*free_fn)(void*);

static drc_decode_fn drc_decode;
static attr_info_fn attr_info;
static attr_fetch_fn attr_fetch;
static free_fn drc_free;

static uint64_t fnv1a(uint64_t h, const void* data, size_t n) {
  const uint8_t* p = (const uint8_t*)data;
  for (size_t i = 0; i < n; ++i) {
    h ^= p[i];
    h *= 1099511628211ull;
  }
  return h;
}

static double now_s(void) {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return (double)ts.tv_sec + 1e-9 * (double)ts.tv_nsec;
}

/* one decoded frame in the ring */
typedef struct {
  float* positions; /* [n, 3] dequantized */
  int64_t num_values;
  double decode_ms;
  int ok;
} Frame;

#define RING 4 /* bounded lookahead, reference's <=3-in-flight + current */

static Frame ring[RING];
static int ring_count = 0, ring_head = 0, ring_tail = 0;
static pthread_mutex_t mu = PTHREAD_MUTEX_INITIALIZER;
static pthread_cond_t cv_space = PTHREAD_COND_INITIALIZER;
static pthread_cond_t cv_data = PTHREAD_COND_INITIALIZER;

static const char* g_dir;
static int g_frames;

static int decode_one(int idx, Frame* out) {
  char path[1024];
  snprintf(path, sizeof(path), "%s/%05d.drc", g_dir, idx);
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  uint8_t* buf = (uint8_t*)malloc((size_t)len);
  if (fread(buf, 1, (size_t)len, f) != (size_t)len) {
    fclose(f);
    free(buf);
    return -1;
  }
  fclose(f);

  double t0 = now_s();
  int64_t info[4];
  void* h = drc_decode(buf, len, info);
  free(buf);
  if (!h || info[0] != 0) return -1;
  int64_t num_attrs = info[1];
  out->positions = NULL;
  out->num_values = 0;
  for (int i = 0; i < (int)num_attrs; ++i) {
    int64_t a[8];
    if (attr_info(h, i, a) != 0) break;
    if (a[0] != 0 /* ATT_POSITION */ || !a[5] /* f32 */) continue;
    int64_t n = a[6], comps = a[7];
    float* vals = (float*)malloc((size_t)n * (size_t)comps * sizeof(float));
    if (attr_fetch(h, i, vals, NULL) != 0) {
      free(vals);
      break;
    }
    out->positions = vals;
    out->num_values = n * comps;
    break;
  }
  drc_free(h);
  out->decode_ms = (now_s() - t0) * 1e3;
  out->ok = out->positions != NULL;
  return out->ok ? 0 : -1;
}

static void* decoder_main(void* arg) {
  (void)arg;
  for (int i = 0; i < g_frames; ++i) {
    Frame fr;
    memset(&fr, 0, sizeof(fr));
    if (decode_one(i, &fr) != 0) fr.ok = 0;
    pthread_mutex_lock(&mu);
    while (ring_count == RING) pthread_cond_wait(&cv_space, &mu);
    ring[ring_tail] = fr;
    ring_tail = (ring_tail + 1) % RING;
    ring_count += 1;
    pthread_cond_signal(&cv_data);
    pthread_mutex_unlock(&mu);
  }
  return NULL;
}

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr,
            "usage: %s <libuvt_draco.so> <geometry_dir> [frames] [fps]\n",
            argv[0]);
    return 2;
  }
  g_dir = argv[2];
  g_frames = argc > 3 ? atoi(argv[3]) : 250;
  double fps = argc > 4 ? atof(argv[4]) : 30.0;
  double frame_duration = 1.0 / fps;

  void* lib = dlopen(argv[1], RTLD_NOW);
  if (!lib) {
    fprintf(stderr, "dlopen: %s\n", dlerror());
    return 2;
  }
  drc_decode = (drc_decode_fn)dlsym(lib, "uvt_drc_decode");
  attr_info = (attr_info_fn)dlsym(lib, "uvt_drc_attr_info");
  attr_fetch = (attr_fetch_fn)dlsym(lib, "uvt_drc_attr_fetch");
  drc_free = (free_fn)dlsym(lib, "uvt_drc_free");
  if (!drc_decode || !attr_info || !attr_fetch || !drc_free) {
    fprintf(stderr, "missing uvt_drc_* symbols\n");
    return 2;
  }

  pthread_t decoder;
  if (pthread_create(&decoder, NULL, decoder_main, NULL) != 0) return 2;

  double start = now_s();
  double total_decode_ms = 0.0;
  uint64_t fnv = 14695981039346656037ull;
  int late = 0, shown = 0;
  for (int i = 0; i < g_frames; ++i) {
    double deadline = start + (double)i * frame_duration;
    pthread_mutex_lock(&mu);
    while (ring_count == 0) pthread_cond_wait(&cv_data, &mu);
    Frame fr = ring[ring_head];
    ring_head = (ring_head + 1) % RING;
    ring_count -= 1;
    pthread_cond_signal(&cv_space);
    pthread_mutex_unlock(&mu);

    if (!fr.ok) {
      fprintf(stderr, "frame %d failed to decode\n", i);
      return 1;
    }
    double t = now_s();
    if (t > deadline + frame_duration) late += 1;
    /* "present": fold the vertex payload into the running checksum */
    fnv = fnv1a(fnv, fr.positions,
                (size_t)fr.num_values * sizeof(float));
    total_decode_ms += fr.decode_ms;
    free(fr.positions);
    shown += 1;
    /* pace the clock (only sleeps when decode runs ahead) */
    double next = start + (double)(i + 1) * frame_duration;
    double now = now_s();
    if (now < next) {
      struct timespec ts;
      double wait = next - now;
      ts.tv_sec = (time_t)wait;
      ts.tv_nsec = (long)((wait - (double)ts.tv_sec) * 1e9);
      nanosleep(&ts, NULL);
    }
  }
  pthread_join(decoder, NULL);
  double wall = now_s() - start;
  printf(
      "native_player frames=%d late=%d fps_wall=%.1f decode_ms_mean=%.2f "
      "fnv=%016llx\n",
      shown, late, (double)shown / wall, total_decode_ms / (double)shown,
      (unsigned long long)fnv);
  dlclose(lib);
  return 0;
}
