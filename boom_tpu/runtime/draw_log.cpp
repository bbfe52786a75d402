// Asynchronous buffered draw log: the native runtime component replacing
// the reference's parameter-draw I/O managers
// (cpputil/ParamFileIoManager.hpp:35 SingleParameterIoManager — buffered
// flat-file parameter logs — and the write/stream halves of
// Interfaces/R/list_io.hpp:54-80 RListIoManager).
//
// A background writer thread drains a ring buffer of fixed-size records
// to disk, so the Python/JAX side never blocks on file I/O while the TPU
// is sampling; the reader side streams records back for
// prediction/diagnostics (the reference's prepare_to_stream/advance).
//
// File format: 32-byte header
//   magic "BOOMDLOG" | u32 version | u32 dtype (0=f32, 1=f64)
//   | u64 record_elems | u64 reserved
// followed by raw little-endian records.
//
// C ABI only (ctypes binding in drawlog.py); no exceptions across the
// boundary.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr char kMagic[8] = {'B', 'O', 'O', 'M', 'D', 'L', 'O', 'G'};
constexpr uint32_t kVersion = 1;

struct Header {
  char magic[8];
  uint32_t version;
  uint32_t dtype;  // 0 = float32, 1 = float64
  uint64_t record_elems;
  uint64_t reserved;
};
static_assert(sizeof(Header) == 32, "header must be 32 bytes");

struct Writer {
  FILE* file = nullptr;
  size_t record_bytes = 0;
  size_t capacity_records = 0;
  std::vector<char> ring;
  size_t head = 0;  // next write slot (producer)
  size_t tail = 0;  // next flush slot (consumer)
  size_t count = 0; // records in ring
  std::mutex mu;
  std::condition_variable not_full;
  std::condition_variable not_empty;
  std::thread thread;
  std::atomic<bool> stop{false};
  std::atomic<long long> records_written{0};   // fwritten by the drainer
  std::atomic<long long> records_appended{0};  // enqueued by producers
  std::condition_variable drained;             // signaled after each fwrite

  void Run() {
    std::vector<char> chunk;
    for (;;) {
      size_t n = 0;
      {
        std::unique_lock<std::mutex> lock(mu);
        not_empty.wait(lock, [&] { return count > 0 || stop.load(); });
        if (count == 0 && stop.load()) break;
        // drain a contiguous span
        n = count;
        size_t contiguous = capacity_records - tail;
        if (n > contiguous) n = contiguous;
        chunk.assign(ring.begin() + tail * record_bytes,
                     ring.begin() + (tail + n) * record_bytes);
        tail = (tail + n) % capacity_records;
        count -= n;
      }
      not_full.notify_all();
      if (n > 0) {
        fwrite(chunk.data(), record_bytes, n, file);
        {
          // Increment under mu so dlog_flush's predicate check can't
          // interleave with the increment (lost-wakeup prevention).
          std::lock_guard<std::mutex> lock(mu);
          records_written.fetch_add(static_cast<long long>(n));
        }
        drained.notify_all();
      }
    }
    fflush(file);
  }
};

}  // namespace

extern "C" {

// Returns an opaque handle (heap pointer) or null on failure.
void* dlog_open(const char* path, uint64_t record_elems, uint32_t dtype,
                uint64_t buffer_records) {
  FILE* f = fopen(path, "wb");
  if (!f) return nullptr;
  Header h;
  memcpy(h.magic, kMagic, 8);
  h.version = kVersion;
  h.dtype = dtype;
  h.record_elems = record_elems;
  h.reserved = 0;
  if (fwrite(&h, sizeof(h), 1, f) != 1) {
    fclose(f);
    return nullptr;
  }
  auto* w = new Writer();
  w->file = f;
  size_t elem = dtype == 1 ? 8 : 4;
  w->record_bytes = record_elems * elem;
  w->capacity_records = buffer_records == 0 ? 64 : buffer_records;
  w->ring.resize(w->record_bytes * w->capacity_records);
  w->thread = std::thread([w] { w->Run(); });
  return w;
}

// Appends n_records records (blocking while the ring is full).
int dlog_append(void* handle, const void* data, uint64_t n_records) {
  auto* w = static_cast<Writer*>(handle);
  if (!w) return -1;
  const char* src = static_cast<const char*>(data);
  uint64_t remaining = n_records;
  while (remaining > 0) {
    std::unique_lock<std::mutex> lock(w->mu);
    w->not_full.wait(lock, [&] { return w->count < w->capacity_records; });
    uint64_t space = w->capacity_records - w->count;
    uint64_t contiguous = w->capacity_records - w->head;
    uint64_t n = remaining;
    if (n > space) n = space;
    if (n > contiguous) n = contiguous;
    memcpy(w->ring.data() + w->head * w->record_bytes, src,
           n * w->record_bytes);
    w->head = (w->head + n) % w->capacity_records;
    w->count += n;
    w->records_appended.fetch_add(static_cast<long long>(n));
    src += n * w->record_bytes;
    remaining -= n;
    lock.unlock();
    w->not_empty.notify_one();
  }
  return 0;
}

// Blocks until everything buffered so far hits the OS file buffers.
int dlog_flush(void* handle) {
  auto* w = static_cast<Writer*>(handle);
  if (!w) return -1;
  // Wait until every record appended so far has actually been fwritten.
  // (Checking count == 0 is not enough: Run() decrements count before the
  // fwrite of the drained chunk, so an empty ring can still have records
  // in flight.)
  const long long target = w->records_appended.load();
  {
    std::unique_lock<std::mutex> lock(w->mu);
    w->drained.wait(lock, [&] { return w->records_written.load() >= target; });
  }
  fflush(w->file);
  return 0;
}

long long dlog_records_written(void* handle) {
  auto* w = static_cast<Writer*>(handle);
  return w ? w->records_written.load() : -1;
}

int dlog_close(void* handle) {
  auto* w = static_cast<Writer*>(handle);
  if (!w) return -1;
  {
    std::unique_lock<std::mutex> lock(w->mu);
    w->stop.store(true);
  }
  w->not_empty.notify_all();
  w->thread.join();
  fclose(w->file);
  delete w;
  return 0;
}

// ---- reader side (stream draws back; list_io prepare_to_stream) -------

// Fills *record_elems / *dtype; returns record count, or -1 on error.
long long dlog_info(const char* path, uint64_t* record_elems,
                    uint32_t* dtype) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  Header h;
  if (fread(&h, sizeof(h), 1, f) != 1 || memcmp(h.magic, kMagic, 8) != 0) {
    fclose(f);
    return -1;
  }
  fseek(f, 0, SEEK_END);
  long long bytes = ftell(f) - static_cast<long long>(sizeof(Header));
  fclose(f);
  size_t elem = h.dtype == 1 ? 8 : 4;
  *record_elems = h.record_elems;
  *dtype = h.dtype;
  return bytes / static_cast<long long>(h.record_elems * elem);
}

// Reads n records starting at offset into out; returns records read.
long long dlog_read(const char* path, uint64_t offset, uint64_t n,
                    void* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  Header h;
  if (fread(&h, sizeof(h), 1, f) != 1 || memcmp(h.magic, kMagic, 8) != 0) {
    fclose(f);
    return -1;
  }
  size_t elem = h.dtype == 1 ? 8 : 4;
  size_t rb = h.record_elems * elem;
  fseek(f, static_cast<long>(sizeof(Header) + offset * rb), SEEK_SET);
  size_t got = fread(out, rb, n, f);
  fclose(f);
  return static_cast<long long>(got);
}

}  // extern "C"
