// Native batch loader: mmap'd decoded-image cache + threaded batch assembly.
//
// TPU-native replacement for the reference's 10-worker torch DataLoader
// (reference train.py:128-133): instead of forking Python processes that
// re-decode JPEG/PNG with cv2 every epoch, the dataset is decoded ONCE into
// a flat binary cache (see lmnet_tpu/data/native_loader.py:build_cache) and
// this library streams shuffled batches out of the page cache at memory
// bandwidth with a small thread pool.  No Python executes per sample.
//
// Cache layout (little-endian):
//   magic  u64 = 0x4C4D4E45545F4331  ("LMNET_C1")
//   n      u64   number of samples
//   h, w   u64   image height/width
//   then n * (h*w*3) bytes of uint8 RGB images
//   then n * (h*w)   bytes of uint8 masks
//
// C ABI (used via ctypes):
//   void* lm_open(const char* path);
//   long  lm_count(void* handle);  long lm_height(void*); long lm_width(void*);
//   void  lm_gather(void* handle, const long* indices, long batch,
//                   unsigned char* out_images, unsigned char* out_masks,
//                   int num_threads);
//   void  lm_close(void* handle);

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <thread>
#include <vector>

namespace {

constexpr uint64_t kMagic = 0x4C4D4E45545F4331ULL;

struct Cache {
  int fd = -1;
  size_t file_size = 0;
  const uint8_t* base = nullptr;
  uint64_t n = 0, h = 0, w = 0;
  const uint8_t* images = nullptr;
  const uint8_t* masks = nullptr;
};

}  // namespace

extern "C" {

void* lm_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* mem = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (mem == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  madvise(mem, st.st_size, MADV_WILLNEED);
  const size_t file_size = static_cast<size_t>(st.st_size);
  const size_t hdr_sz = 4 * sizeof(uint64_t);
  if (file_size < hdr_sz) {
    munmap(mem, st.st_size);
    ::close(fd);
    return nullptr;
  }
  const uint64_t* hdr = static_cast<const uint64_t*>(mem);
  const uint64_t n = hdr[1], h = hdr[2], w = hdr[3];
  // Overflow-safe validation of n*h*w*4 + hdr against the actual file size
  // BEFORE deriving any data pointers: a corrupted/truncated cache whose
  // header product wraps uint64 must be rejected, not mmap-read OOB.
  const uint64_t payload = file_size - hdr_sz;
  bool ok = hdr[0] == kMagic && n > 0 && h > 0 && w > 0;
  // each factor must individually fit, then check via division (no overflow)
  ok = ok && h <= payload && w <= payload / h && n <= payload / h / w / 4;
  ok = ok && n * h * w * 4 <= payload;  // exact bytes check (images+masks)
  if (!ok) {
    munmap(mem, st.st_size);
    ::close(fd);
    return nullptr;
  }
  Cache* c = new Cache();
  c->fd = fd;
  c->file_size = file_size;
  c->base = static_cast<const uint8_t*>(mem);
  c->n = n;
  c->h = h;
  c->w = w;
  c->images = c->base + hdr_sz;
  c->masks = c->images + n * h * w * 3;
  return c;
}

long lm_count(void* handle) { return static_cast<Cache*>(handle)->n; }
long lm_height(void* handle) { return static_cast<Cache*>(handle)->h; }
long lm_width(void* handle) { return static_cast<Cache*>(handle)->w; }

// Gather `batch` samples by index into contiguous output buffers.
void lm_gather(void* handle, const long* indices, long batch,
               unsigned char* out_images, unsigned char* out_masks,
               int num_threads) {
  Cache* c = static_cast<Cache*>(handle);
  const size_t img_sz = c->h * c->w * 3;
  const size_t msk_sz = c->h * c->w;
  if (num_threads < 1) num_threads = 1;
  if (num_threads > batch) num_threads = static_cast<int>(batch);

  auto worker = [&](long lo, long hi) {
    for (long i = lo; i < hi; ++i) {
      const long idx = indices[i];
      std::memcpy(out_images + i * img_sz, c->images + idx * img_sz, img_sz);
      std::memcpy(out_masks + i * msk_sz, c->masks + idx * msk_sz, msk_sz);
    }
  };

  if (num_threads == 1) {
    worker(0, batch);
    return;
  }
  std::vector<std::thread> threads;
  const long per = (batch + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    long lo = t * per;
    long hi = lo + per > batch ? batch : lo + per;
    if (lo >= hi) break;
    threads.emplace_back(worker, lo, hi);
  }
  for (auto& th : threads) th.join();
}

void lm_close(void* handle) {
  Cache* c = static_cast<Cache*>(handle);
  if (c->base) munmap(const_cast<uint8_t*>(c->base), c->file_size);
  if (c->fd >= 0) ::close(c->fd);
  delete c;
}

}  // extern "C"
