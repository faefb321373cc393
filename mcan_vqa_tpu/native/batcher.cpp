// Native host-data runtime: parallel gather + pad + fp16->fp32 batch
// assembly over the packed feature cache.
//
// The reference's host-side input work runs in Python DataLoader worker
// processes (reference: core/data/load_data.py:267-300). Here the per-batch
// hot loop — B memmap slices, zero-padding to [B, pad_rows, dim], and fp16
// -> fp32 widening — is a single C call fanned out over a persistent
// std::thread pool, keeping the TPU host's input path off the GIL entirely.
//
// C ABI (ctypes): see mcan_vqa_tpu/data/native_batcher.py.

#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <functional>
#include <mutex>
#include <queue>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

// fp16 -> fp32, scalar bit-twiddle (no F16C dependency; the compiler
// vectorizes the loop well at -O3).
inline float half_to_float(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1Fu;
  uint32_t mant = h & 0x3FFu;
  uint32_t bits;
  if (exp == 0) {
    if (mant == 0) {
      bits = sign;  // +-0
    } else {        // subnormal: normalize
      int shift = 0;
      while (!(mant & 0x400u)) {
        mant <<= 1;
        ++shift;
      }
      mant &= 0x3FFu;
      // subnormal value = (1 + mant/1024) * 2^(-14 - shift)
      bits = sign | ((uint32_t)(113 - shift) << 23) | (mant << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7F800000u | (mant << 13);  // inf/nan
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float out;
  std::memcpy(&out, &bits, sizeof(out));
  return out;
}

class ThreadPool {
 public:
  explicit ThreadPool(unsigned n) {
    if (n == 0) n = 1;
    for (unsigned i = 0; i < n; ++i) {
      workers_.emplace_back([this] { run(); });
    }
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void submit(std::function<void()> f) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      q_.push(std::move(f));
    }
    cv_.notify_one();
  }

 private:
  void run() {
    for (;;) {
      std::function<void()> f;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        f = std::move(q_.front());
        q_.pop();
      }
      f();
    }
  }
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> q_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

struct Cache {
  const uint16_t* data = nullptr;  // mmap'ed fp16 [rows, dim]
  uint64_t rows = 0;
  uint32_t dim = 0;
  size_t bytes = 0;
  int fd = -1;
  ThreadPool* pool = nullptr;
};

// f32 -> bf16 with round-to-nearest-even (top 16 bits + rounding).
// NaN-safe: the rounding add would otherwise carry a NaN's mantissa
// into the exponent, silently emitting +-Inf for NaN inputs (and
// diverging from the numpy fallback, which preserves NaN).
inline uint16_t float_to_bf16(float f) {
  uint32_t bits;
  std::memcpy(&bits, &f, sizeof(bits));
  if ((bits & 0x7FFFFFFFu) > 0x7F800000u)
    return (uint16_t)((bits >> 16) | 0x0040u);  // quiet NaN, keep sign
  bits += 0x7FFFu + ((bits >> 16) & 1u);
  return (uint16_t)(bits >> 16);
}

template <typename T>
inline T convert_half(uint16_t h);
template <>
inline float convert_half<float>(uint16_t h) { return half_to_float(h); }
template <>
inline uint16_t convert_half<uint16_t>(uint16_t h) {
  return float_to_bf16(half_to_float(h));
}

template <typename T>
void gather_one(const Cache* c, uint64_t start, uint32_t len,
                uint32_t pad_rows, T* dst) {
  if (len > pad_rows) len = pad_rows;
  // Bounds-clamp against the mmap: an inconsistent index (stale
  // index.json mixed with a different build's features.bin) must not
  // read past the mapping — the numpy fallback raises a Python error,
  // an OOB read here would SIGBUS the whole serving process.
  if (start > c->rows) start = c->rows;
  if (start + len > c->rows) len = (uint32_t)(c->rows - start);
  const uint16_t* src = c->data + start * c->dim;
  const size_t n = (size_t)len * c->dim;
  for (size_t i = 0; i < n; ++i) dst[i] = convert_half<T>(src[i]);
  std::memset(dst + n, 0, ((size_t)(pad_rows - len) * c->dim) * sizeof(T));
}

// Shared batch driver for the fp32/bf16 entry points. The completion
// handshake mutates the counter UNDER the mutex: with a bare atomic, the
// waiter's predicate could become true while the last worker sits
// between fetch_add and lock — a spurious wakeup would then let the
// caller destroy the stack mutex/condvar the worker is about to lock
// (UB). One uncontended lock per item is noise next to the row memcpy.
template <typename T>
void gather_pad_batch(Cache* c, const uint64_t* starts, const uint32_t* lens,
                      uint32_t batch, uint32_t pad_rows, T* out) {
  uint32_t done = 0;
  std::mutex mu;
  std::condition_variable cv;
  const size_t item_elems = (size_t)pad_rows * c->dim;
  for (uint32_t i = 0; i < batch; ++i) {
    c->pool->submit([=, &done, &mu, &cv] {
      gather_one<T>(c, starts[i], lens[i], pad_rows,
                    out + (size_t)i * item_elems);
      std::lock_guard<std::mutex> lk(mu);
      if (++done == batch) cv.notify_one();
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done == batch; });
}

}  // namespace

extern "C" {

// Open the packed cache: mmap features.bin. Returns handle or null.
void* bf_open(const char* path, uint64_t rows, uint32_t dim,
              uint32_t n_threads) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  size_t bytes = (size_t)rows * dim * sizeof(uint16_t);
  void* p = ::mmap(nullptr, bytes, PROT_READ, MAP_SHARED, fd, 0);
  if (p == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  ::madvise(p, bytes, MADV_RANDOM);
  auto* c = new Cache();
  c->data = static_cast<const uint16_t*>(p);
  c->rows = rows;
  c->dim = dim;
  c->bytes = bytes;
  c->fd = fd;
  c->pool = new ThreadPool(n_threads ? n_threads
                                     : std::thread::hardware_concurrency());
  return c;
}

void bf_close(void* handle) {
  auto* c = static_cast<Cache*>(handle);
  if (!c) return;
  delete c->pool;
  ::munmap(const_cast<uint16_t*>(c->data), c->bytes);
  ::close(c->fd);
  delete c;
}

// Assemble one batch: for each item i, copy rows [starts[i],
// starts[i]+lens[i]) widened to fp32 into out[i, :, :], zero-padding to
// pad_rows. out must hold B*pad_rows*dim floats. Parallel over items.
void bf_gather_pad(void* handle, const uint64_t* starts, const uint32_t* lens,
                   uint32_t batch, uint32_t pad_rows, float* out) {
  gather_pad_batch<float>(static_cast<Cache*>(handle), starts, lens, batch,
                          pad_rows, out);
}

// Same as bf_gather_pad but emits bf16 (uint16 bit pattern) — HALF the
// host->device bytes for a serving engine whose matmuls are bf16 anyway.
void bf_gather_pad_bf16(void* handle, const uint64_t* starts,
                        const uint32_t* lens, uint32_t batch,
                        uint32_t pad_rows, uint16_t* out) {
  gather_pad_batch<uint16_t>(static_cast<Cache*>(handle), starts, lens, batch,
                             pad_rows, out);
}

uint32_t bf_dim(void* handle) { return static_cast<Cache*>(handle)->dim; }
uint64_t bf_rows(void* handle) { return static_cast<Cache*>(handle)->rows; }

}  // extern "C"
