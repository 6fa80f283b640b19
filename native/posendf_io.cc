// posendf_io: native data-loading runtime for PoseNDF-TPU.
//
// The reference feeds training from 30 DataLoader worker *processes*
// (model/load_data.py:76-85, configs/amass.yaml:52), each re-decoding .npz
// files and gathering random rows in Python. This library replaces that with
// an in-process C++ runtime:
//
//   * zero-copy .npz access: np.savez writes STORED (uncompressed) zip
//     entries, so files are mmap'd once and every .npy payload is served as
//     a raw pointer — no decode, no copy, page cache shared across epochs;
//   * multithreaded batch assembly: the hot loop of training input — gather
//     num_pts random rows per file, reduce the k distance labels to their
//     mean, optional w>=0 quaternion canonicalization — fans out over worker
//     threads (spawned per call above a size threshold; thread creation is
//     ~10 us against millisecond gathers) writing directly into the
//     caller's buffer. Row sampling is seeded PER ITEM, so results are
//     identical for any thread count.
//
// Alignment note: np.savez places .npy float payloads at arbitrary byte
// offsets inside the zip (measured: 2 mod 4), so payloads are addressed as
// const char* and every scalar read goes through an alignment-safe memcpy
// load — never a reinterpret_cast<const float*> dereference.
//
// Exposed as a plain C ABI consumed via ctypes (posendf_tpu/data/native.py).
// Build: native/build.sh -> libposendf_io.so.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#if defined(__SSE2__)
#include <emmintrin.h>  // global scope: SSE headers may declare globals
#endif

namespace {

// ---------------------------------------------------------------------------
// minimal zip (STORED entries only) + npy header parsing
// ---------------------------------------------------------------------------

struct NpyArray {
  const char* data = nullptr;   // payload (after the npy header)
  std::vector<int64_t> shape;
  char dtype = '?';             // 'f' float32, 'd' float64, 'q' int64, 'i' int32
  int64_t itemsize = 0;
  int64_t rows() const { return shape.empty() ? 0 : shape[0]; }
  int64_t row_elems() const {
    int64_t n = 1;
    for (size_t i = 1; i < shape.size(); ++i) n *= shape[i];
    return n;
  }
};

struct NpzFile {
  int fd = -1;
  const char* base = nullptr;
  size_t size = 0;
  std::unordered_map<std::string, NpyArray> arrays;
  std::string error;
};

uint16_t rd16(const char* p) { uint16_t v; std::memcpy(&v, p, 2); return v; }
uint32_t rd32(const char* p) { uint32_t v; std::memcpy(&v, p, 4); return v; }
// alignment-safe float load (payloads are NOT 4-byte aligned in npz files)
inline float ldf(const char* p) { float v; std::memcpy(&v, p, 4); return v; }

bool parse_npy(const char* p, size_t len, NpyArray* out) {
  if (len < 10 || std::memcmp(p, "\x93NUMPY", 6) != 0) return false;
  const uint8_t major = static_cast<uint8_t>(p[6]);
  size_t header_len, header_off;
  if (major == 1) {
    header_len = rd16(p + 8);
    header_off = 10;
  } else {
    header_len = rd32(p + 8);
    header_off = 12;
  }
  if (header_off + header_len > len) return false;
  std::string hdr(p + header_off, header_len);

  // dtype: '<f4' etc.
  auto dpos = hdr.find("'descr'");
  if (dpos == std::string::npos) return false;
  auto q0 = hdr.find('\'', dpos + 7);
  auto q1 = hdr.find('\'', q0 + 1);
  std::string descr = hdr.substr(q0 + 1, q1 - q0 - 1);
  if (descr == "<f4" || descr == "|f4") { out->dtype = 'f'; out->itemsize = 4; }
  else if (descr == "<f8") { out->dtype = 'd'; out->itemsize = 8; }
  else if (descr == "<i8") { out->dtype = 'q'; out->itemsize = 8; }
  else if (descr == "<i4") { out->dtype = 'i'; out->itemsize = 4; }
  else return false;  // fortran_order / exotic dtypes unsupported

  if (hdr.find("'fortran_order': False") == std::string::npos) return false;

  auto spos = hdr.find("'shape':");
  auto l = hdr.find('(', spos);
  auto r = hdr.find(')', l);
  std::string shape_s = hdr.substr(l + 1, r - l - 1);
  out->shape.clear();
  int64_t cur = -1;
  for (char c : shape_s) {
    if (c >= '0' && c <= '9') cur = (cur < 0 ? 0 : cur) * 10 + (c - '0');
    else if (cur >= 0) { out->shape.push_back(cur); cur = -1; }
  }
  if (cur >= 0) out->shape.push_back(cur);
  // the header's claimed extent must fit inside the zip entry payload —
  // otherwise every later row gather reads out of bounds
  int64_t total = out->itemsize;
  for (int64_t d : out->shape) total *= d;
  if (header_off + header_len + static_cast<size_t>(total) > len) return false;
  out->data = p + header_off + header_len;
  return true;
}

NpzFile* open_npz(const char* path) {
  auto* f = new NpzFile();
  f->fd = ::open(path, O_RDONLY);
  if (f->fd < 0) { f->error = "open failed"; return f; }
  struct stat st;
  if (fstat(f->fd, &st) != 0 || st.st_size < 22) { f->error = "stat failed"; return f; }
  f->size = static_cast<size_t>(st.st_size);
  void* m = mmap(nullptr, f->size, PROT_READ, MAP_PRIVATE, f->fd, 0);
  if (m == MAP_FAILED) { f->error = "mmap failed"; return f; }
  f->base = static_cast<const char*>(m);

  // walk local file headers (PK\x03\x04); np.savez writes sequentially
  size_t off = 0;
  while (off + 30 <= f->size) {
    const char* p = f->base + off;
    if (rd32(p) != 0x04034b50u) break;  // not a local header -> central dir
    const uint16_t method = rd16(p + 8);
    uint64_t comp_size = rd32(p + 18);
    const uint16_t name_len = rd16(p + 26);
    const uint16_t extra_len = rd16(p + 28);
    if (off + 30 + static_cast<size_t>(name_len) + extra_len > f->size) break;
    std::string name(p + 30, name_len);
    const char* payload = p + 30 + name_len + extra_len;
    // zip64: full 64-bit sizes live in the 0x0001 extra field (layout:
    // uncompressed size @ +4, compressed size @ +12)
    if (comp_size == 0xFFFFFFFFull) {
      const char* e = p + 30 + name_len;
      const char* eend = e + extra_len;
      while (e + 4 <= eend) {
        uint16_t id = rd16(e), sz = rd16(e + 2);
        if (id == 0x0001 && sz >= 16) {
          uint64_t v;
          std::memcpy(&v, e + 12, 8);
          comp_size = v;
        }
        e += 4 + sz;
      }
    }
    // a truncated/corrupt entry must not walk the parser past the mapping
    if (comp_size > f->size ||
        static_cast<size_t>(payload - f->base) > f->size - comp_size) break;
    if (method == 0 && name.size() > 4 &&
        name.compare(name.size() - 4, 4, ".npy") == 0) {
      NpyArray arr;
      if (parse_npy(payload, comp_size, &arr)) {
        f->arrays.emplace(name.substr(0, name.size() - 4), std::move(arr));
      }
    }
    off = static_cast<size_t>(payload - f->base) + comp_size;
  }
  if (f->arrays.empty()) f->error = "no stored .npy entries (compressed npz?)";
  return f;
}

void close_npz(NpzFile* f) {
  if (!f) return;
  if (f->base) munmap(const_cast<char*>(f->base), f->size);
  if (f->fd >= 0) ::close(f->fd);
  delete f;
}

// splitmix64 hash — one deterministic draw per (seed, item) pair, so the
// sampled rows are identical for ANY thread count / chunking (the training
// pipeline documents batches as reproducible from (seed, epoch) alone)
inline uint64_t mix64(uint64_t z) {
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
  return z ^ (z >> 31);
}
inline int64_t draw_below(uint64_t seed, int64_t i, int64_t n) {
  const uint64_t z =
      mix64(seed + 0x9E3779B97f4A7C15ull * (static_cast<uint64_t>(i) + 1));
  return static_cast<int64_t>(z % static_cast<uint64_t>(n));
}

// gather prefetch lookahead (rows); sized so ~8 rows x ~6 lines of pending
// prefetches stay well inside the load-miss queue
#ifndef POSENDF_PF
#define POSENDF_PF 8
#endif
constexpr int64_t kPrefetchAhead = POSENDF_PF;

#if defined(__SSE2__)
// Copy one row with unaligned loads + non-temporal stores. The destination
// batch buffer is written exactly once and read next by the DMA engine /
// device transfer, so letting it allocate cache lines (regular stores RFO
// the line first) both wastes half the store bandwidth and evicts the mmap'd
// source pages the next gathers want. npz payloads sit at arbitrary byte
// offsets (2 mod 4 measured), hence loadu on the source.
inline void copy_row_stream(float* dst, const char* src, int64_t bytes) {
  if ((reinterpret_cast<uintptr_t>(dst) & 15u) == 0) {
    int64_t j = 0;
    for (; j + 16 <= bytes; j += 16) {
      __m128i v = _mm_loadu_si128(reinterpret_cast<const __m128i*>(src + j));
      _mm_stream_si128(reinterpret_cast<__m128i*>(
                           reinterpret_cast<char*>(dst) + j), v);
    }
    if (j < bytes) std::memcpy(reinterpret_cast<char*>(dst) + j, src + j,
                               bytes - j);
  } else {
    std::memcpy(dst, src, bytes);
  }
}
// Non-temporal stores are weakly ordered: they sit in WC buffers that are
// only architecturally flushed by a store fence. Each thread that streamed
// rows must fence before its results become visible to the joining thread
// (and before a single-threaded caller returns the buffer to Python).
inline void stream_fence() { _mm_sfence(); }
#else
inline void copy_row_stream(float* dst, const char* src, int64_t bytes) {
  std::memcpy(dst, src, bytes);
}
inline void stream_fence() {}
#endif

void parallel_for(int64_t n, int threads, const std::function<void(int64_t, int64_t)>& fn) {
  threads = std::max(1, threads);
  // oversubscribing the machine makes gathers SLOWER (measured on a 1-vCPU
  // host: threads=8 ran 1.5x slower than threads=1 — spawns + contention on
  // a core that must also run the spawner); never exceed hardware threads
  const unsigned hw = std::thread::hardware_concurrency();
  if (hw > 0) threads = std::min<int>(threads, static_cast<int>(hw));
  // below ~4k items thread spawn overhead rivals the gather itself
  if (threads == 1 || n < 4096) {
    fn(0, n);
    stream_fence();  // flush this thread's NT stores before returning
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (n + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    // per-thread sfence: NT stores drain from WC buffers only at a fence;
    // relying on the join path's locked instructions to flush them is
    // unspecified, and a torn row would reach training data silently
    pool.emplace_back([&fn, lo, hi] { fn(lo, hi); stream_fence(); });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

void* pndf_open(const char* path) {
  NpzFile* f = open_npz(path);
  if (!f->error.empty()) { close_npz(f); return nullptr; }
  return f;
}

void pndf_close(void* handle) { close_npz(static_cast<NpzFile*>(handle)); }

// rows of array `key`; -1 if missing
int64_t pndf_rows(void* handle, const char* key) {
  auto* f = static_cast<NpzFile*>(handle);
  auto it = f->arrays.find(key);
  return it == f->arrays.end() ? -1 : it->second.rows();
}

// elements per row; -1 if missing
int64_t pndf_row_elems(void* handle, const char* key) {
  auto* f = static_cast<NpzFile*>(handle);
  auto it = f->arrays.find(key);
  return it == f->arrays.end() ? -1 : it->second.row_elems();
}

// Assemble one training sub-batch from an open labeled file:
//   poses_out (n, 84) float32  <- pose[idx], optionally w>=0 flipped
//   dist_out  (n,)    float32  <- mean over the k label columns of dist[idx]
// idx are drawn internally from splitmix64(seed). Returns 0 on success.
int pndf_sample_labeled(void* handle, int64_t n, uint64_t seed, int flip,
                        float* poses_out, float* dist_out, int threads) {
  auto* f = static_cast<NpzFile*>(handle);
  auto pit = f->arrays.find("pose");
  auto dit = f->arrays.find("dist");
  if (pit == f->arrays.end() || dit == f->arrays.end()) return 1;
  const NpyArray& pose = pit->second;
  const NpyArray& dist = dit->second;
  if (pose.dtype != 'f' || dist.dtype != 'f') return 2;
  const int64_t rows = pose.rows();
  const int64_t pe = pose.row_elems();     // 84 (21*4)
  const int64_t ke = dist.row_elems();     // k labels per row
  if (rows <= 0 || pe % 4 != 0) return 3;
  // a dist array shorter than pose would silently index past its payload;
  // ke == 0 would emit 0/0 = NaN labels
  if (dist.rows() != rows || ke <= 0) return 4;
  const char* pbase = pose.data;
  const char* dbase = dist.data;

  parallel_for(n, threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      // random-row gathers are DRAM-latency-bound (rows land on ~6 distinct
      // cache lines each); prefetching the row PF iterations ahead overlaps
      // those misses with the current row's copy (draw_below is pure, so
      // recomputing the future index costs two multiplies)
      if (i + kPrefetchAhead < hi) {
        const int64_t rf = draw_below(seed, i + kPrefetchAhead, rows);
        const char* pf = pbase + rf * pe * 4;
        for (int64_t off = 0; off < pe * 4; off += 64)
          __builtin_prefetch(pf + off, 0, 2);
        __builtin_prefetch(dbase + rf * ke * 4, 0, 2);
      }
      const int64_t r = draw_below(seed, i, rows);
      const char* src = pbase + r * pe * 4;
      float* dst = poses_out + i * pe;
      if (flip) {
        for (int64_t j = 0; j < pe; j += 4) {
          const float w = ldf(src + j * 4);
          const float sign = w < 0.0f ? -1.0f : 1.0f;
          dst[j] = sign * w;
          dst[j + 1] = sign * ldf(src + (j + 1) * 4);
          dst[j + 2] = sign * ldf(src + (j + 2) * 4);
          dst[j + 3] = sign * ldf(src + (j + 3) * 4);
        }
      } else {
        copy_row_stream(dst, src, pe * 4);
      }
      const char* drow = dbase + r * ke * 4;
      float acc = 0.0f;
      for (int64_t j = 0; j < ke; ++j) acc += ldf(drow + j * 4);
      dist_out[i] = acc / static_cast<float>(ke);
    }
  });
  return 0;
}

// Gather n random rows of float32 array `key` into out (n, row_elems).
int pndf_sample_rows(void* handle, const char* key, int64_t n, uint64_t seed,
                     int flip, float* out, int threads) {
  auto* f = static_cast<NpzFile*>(handle);
  auto it = f->arrays.find(key);
  if (it == f->arrays.end()) return 1;
  const NpyArray& arr = it->second;
  if (arr.dtype != 'f') return 2;
  const int64_t rows = arr.rows();
  const int64_t pe = arr.row_elems();
  if (rows <= 0) return 3;
  const char* base = arr.data;

  parallel_for(n, threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      if (i + kPrefetchAhead < hi) {
        const char* pf =
            base + draw_below(seed, i + kPrefetchAhead, rows) * pe * 4;
        for (int64_t off = 0; off < pe * 4; off += 64)
          __builtin_prefetch(pf + off, 0, 2);
      }
      const char* src = base + draw_below(seed, i, rows) * pe * 4;
      float* dst = out + i * pe;
      if (flip && pe % 4 == 0) {
        for (int64_t j = 0; j < pe; j += 4) {
          const float w = ldf(src + j * 4);
          const float sign = w < 0.0f ? -1.0f : 1.0f;
          dst[j] = sign * w;
          for (int64_t c = 1; c < 4; ++c)
            dst[j + c] = sign * ldf(src + (j + c) * 4);
        }
      } else {
        std::memcpy(dst, src, pe * sizeof(float));
      }
    }
  });
  return 0;
}

// Assemble one WHOLE training batch in a single call: B (labeled, manifold)
// file pairs, P rows each, flat (B*P, ...) outputs. Replaces 2*B separate
// pndf_sample_labeled/pndf_sample_rows calls — one ctypes crossing and ONE
// thread fan-out per batch instead of 8 sequential spawn/join regions (the
// reference amortizes this over 30 persistent worker processes,
// model/load_data.py:76-85). Row draws are seeded per (file, item) exactly
// like the per-file entry points, so the output is bit-identical to the
// sequential calls for any thread count.
//
//   lab_handles[b]  open labeled npz (keys pose (N,pe), dist (N,k))
//   man_handles[b]  open manifold npz (key pose (M,pe)); ignored when
//                   ref_flip_quirk (the reference feeds the flipped noisy
//                   rows back as man_poses, load_data.py:63)
//   seeds[b]        per-file seed; manifold draws use seeds[b]^0xDEADBEEF
//                   (the pipeline's published derivation)
// Returns 0 on success; nonzero identifies the offending precondition.
int pndf_assemble_batch(void* const* lab_handles, void* const* man_handles,
                        const uint64_t* seeds, int64_t B, int64_t P,
                        int flip, int ref_flip_quirk,
                        float* poses_out, float* dist_out, float* man_out,
                        int threads) {
  if (B <= 0 || P <= 0) return 1;
  struct PerFile {
    const char* pbase; int64_t prows;
    const char* dbase; int64_t ke;
    const char* mbase; int64_t mrows;
  };
  std::vector<PerFile> tab(static_cast<size_t>(B));
  int64_t pe = -1;
  for (int64_t b = 0; b < B; ++b) {
    auto* lf = static_cast<NpzFile*>(lab_handles[b]);
    if (!lf) return 2;
    auto pit = lf->arrays.find("pose");
    auto dit = lf->arrays.find("dist");
    if (pit == lf->arrays.end() || dit == lf->arrays.end()) return 2;
    const NpyArray& pose = pit->second;
    const NpyArray& dist = dit->second;
    if (pose.dtype != 'f' || dist.dtype != 'f') return 3;
    if (pe < 0) pe = pose.row_elems();
    // all files feed one flat (B*P, pe) output — a row-width mismatch would
    // silently interleave garbage
    if (pose.row_elems() != pe || pe % 4 != 0 || pose.rows() <= 0) return 4;
    if (dist.rows() != pose.rows() || dist.row_elems() <= 0) return 5;
    tab[b].pbase = pose.data;
    tab[b].prows = pose.rows();
    tab[b].dbase = dist.data;
    tab[b].ke = dist.row_elems();
    if (ref_flip_quirk) {
      tab[b].mbase = nullptr;
      tab[b].mrows = 0;
    } else {
      auto* mf = static_cast<NpzFile*>(man_handles ? man_handles[b] : nullptr);
      if (!mf) return 6;
      auto mit = mf->arrays.find("pose");
      if (mit == mf->arrays.end()) return 6;
      const NpyArray& man = mit->second;
      if (man.dtype != 'f' || man.row_elems() != pe || man.rows() <= 0)
        return 7;
      tab[b].mbase = man.data;
      tab[b].mrows = man.rows();
    }
  }

  parallel_for(B * P, threads, [&](int64_t lo, int64_t hi) {
    int64_t b = lo / P, i = lo % P;
    for (int64_t g = lo; g < hi; ++g) {
      if (g + kPrefetchAhead < hi) {
        const int64_t gf = g + kPrefetchAhead;
        const PerFile& tf = tab[static_cast<size_t>(gf / P)];
        const int64_t jf = gf % P;
        const uint64_t sf = seeds[gf / P];
        const char* pf =
            tf.pbase + draw_below(sf, jf, tf.prows) * pe * 4;
        for (int64_t off = 0; off < pe * 4; off += 64)
          __builtin_prefetch(pf + off, 0, 2);
        __builtin_prefetch(
            tf.dbase + draw_below(sf, jf, tf.prows) * tf.ke * 4, 0, 2);
        if (tf.mbase) {
          const char* mf = tf.mbase +
              draw_below(sf ^ 0xDEADBEEFull, jf, tf.mrows) * pe * 4;
          for (int64_t off = 0; off < pe * 4; off += 64)
            __builtin_prefetch(mf + off, 0, 2);
        }
      }
      const PerFile& t = tab[static_cast<size_t>(b)];
      const uint64_t seed = seeds[b];
      const int64_t r = draw_below(seed, i, t.prows);
      const char* src = t.pbase + r * pe * 4;
      float* dst = poses_out + g * pe;
      if (flip) {
        for (int64_t j = 0; j < pe; j += 4) {
          const float w = ldf(src + j * 4);
          const float sign = w < 0.0f ? -1.0f : 1.0f;
          dst[j] = sign * w;
          dst[j + 1] = sign * ldf(src + (j + 1) * 4);
          dst[j + 2] = sign * ldf(src + (j + 2) * 4);
          dst[j + 3] = sign * ldf(src + (j + 3) * 4);
        }
      } else {
        copy_row_stream(dst, src, pe * 4);
      }
      const char* drow = t.dbase + r * t.ke * 4;
      float acc = 0.0f;
      for (int64_t j = 0; j < t.ke; ++j) acc += ldf(drow + j * 4);
      dist_out[g] = acc / static_cast<float>(t.ke);

      float* mdst = man_out + g * pe;
      if (ref_flip_quirk) {
        // man_poses = the flipped noisy rows themselves (load_data.py:63);
        // dst already holds them post-flip
        std::memcpy(mdst, dst, pe * sizeof(float));
      } else {
        const int64_t rm = draw_below(seed ^ 0xDEADBEEFull, i, t.mrows);
        const char* msrc = t.mbase + rm * pe * 4;
        if (flip) {
          for (int64_t j = 0; j < pe; j += 4) {
            const float w = ldf(msrc + j * 4);
            const float sign = w < 0.0f ? -1.0f : 1.0f;
            mdst[j] = sign * w;
            mdst[j + 1] = sign * ldf(msrc + (j + 1) * 4);
            mdst[j + 2] = sign * ldf(msrc + (j + 2) * 4);
            mdst[j + 3] = sign * ldf(msrc + (j + 3) * 4);
          }
        } else {
          copy_row_stream(mdst, msrc, pe * 4);
        }
      }
      if (++i == P) { i = 0; ++b; }
    }
  });
  return 0;
}

}  // extern "C"
