// Native host runtime: lock-free SPSC frame ring + stereo frame pump.
//
// The TPU-native replacement for the reference's transport layer: where the
// ROS graph moves frames between processes over TCPROS with per-topic queues
// and drop-based backpressure (SURVEY.md §2.4: queue size 1-10, drop on
// overflow), this runtime moves frames between the decode thread and the
// device-feed thread through a single-producer single-consumer ring of
// preallocated slots — zero-copy on the consumer side (numpy views the slot
// memory directly via ctypes), no GIL involvement on the producer side.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in the image).
//
// Semantics:
//   * push: copies a frame into the next free slot; either blocks (bounded
//     spin+yield) or drops-oldest, matching the reference's two queueing
//     modes (blocking sensor feed vs. queue_size=1 latest-wins topics).
//   * pop: returns a pointer to the oldest filled slot; the consumer calls
//     release() when done, freeing the slot for reuse.

#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstring>
#include <thread>

namespace {

struct Slot {
  double timestamp;
  int64_t seq;
  // payload follows the header in slot_stride bytes
};

struct Ring {
  uint8_t* storage;
  size_t capacity;      // number of slots
  size_t payload_bytes; // bytes per frame payload
  size_t slot_stride;   // aligned total slot size
  std::atomic<uint64_t> head; // next slot to write (producer)
  std::atomic<uint64_t> tail; // next slot to read (consumer)
  std::atomic<uint64_t> dropped;
  int drop_oldest; // 1: overwrite oldest when full; 0: block
};

inline Slot* slot_at(Ring* r, uint64_t idx) {
  return reinterpret_cast<Slot*>(r->storage +
                                 (idx % r->capacity) * r->slot_stride);
}

}  // namespace

extern "C" {

Ring* modt_ring_create(size_t capacity, size_t payload_bytes,
                       int drop_oldest) {
  if (capacity == 0 || payload_bytes == 0) return nullptr;
  Ring* r = new Ring();
  r->capacity = capacity;
  r->payload_bytes = payload_bytes;
  size_t stride = sizeof(Slot) + payload_bytes;
  // 64-byte align slots to keep payloads cacheline-aligned.
  r->slot_stride = (stride + 63) & ~size_t(63);
  r->storage = new uint8_t[r->slot_stride * capacity];
  r->head.store(0);
  r->tail.store(0);
  r->dropped.store(0);
  r->drop_oldest = drop_oldest;
  return r;
}

void modt_ring_destroy(Ring* r) {
  if (!r) return;
  delete[] r->storage;
  delete r;
}

size_t modt_ring_size(Ring* r) {
  return static_cast<size_t>(r->head.load(std::memory_order_acquire) -
                             r->tail.load(std::memory_order_acquire));
}

uint64_t modt_ring_dropped(Ring* r) { return r->dropped.load(); }

// Returns 1 on success, 0 on timeout (blocking mode only).
int modt_ring_push(Ring* r, const uint8_t* payload, double timestamp,
                   int64_t seq, double timeout_s) {
  auto deadline = std::chrono::steady_clock::now() +
                  std::chrono::duration<double>(timeout_s);
  for (;;) {
    uint64_t head = r->head.load(std::memory_order_relaxed);
    uint64_t tail = r->tail.load(std::memory_order_acquire);
    if (head - tail < r->capacity) {
      Slot* s = slot_at(r, head);
      s->timestamp = timestamp;
      s->seq = seq;
      std::memcpy(reinterpret_cast<uint8_t*>(s) + sizeof(Slot), payload,
                  r->payload_bytes);
      r->head.store(head + 1, std::memory_order_release);
      return 1;
    }
    if (r->drop_oldest) {
      // Latest-wins: advance tail, discarding the oldest frame (the
      // reference's queue_size=1 topic behavior). Count a drop only when
      // OUR cas discarded a frame — a concurrent consumer release also
      // moves tail, and that is a consumed frame, not a dropped one.
      if (r->tail.compare_exchange_strong(tail, tail + 1))
        r->dropped.fetch_add(1);
      continue;
    }
    if (std::chrono::steady_clock::now() > deadline) return 0;
    std::this_thread::yield();
  }
}

// Validated-copy pop for drop-oldest rings. The zero-copy pop/release
// protocol below is only safe when the producer never moves tail (blocking
// mode); in drop-oldest mode the producer may reclaim the slot the consumer
// is still reading. Here the consumer instead copies the oldest slot into
// `out` and then claims it with a tail CAS: if the CAS fails the producer
// dropped (and possibly overwrote) that slot mid-copy, so the copy is
// discarded and the read retried at the new tail. The producer's overwrite
// happens strictly after its own successful tail CAS, so a successful
// consumer CAS proves the copied bytes were never concurrently written.
// Returns 1 on success, 0 on timeout.
int modt_ring_pop_copy(Ring* r, uint8_t* out, double* timestamp,
                       int64_t* seq, double timeout_s) {
  auto deadline = std::chrono::steady_clock::now() +
                  std::chrono::duration<double>(timeout_s);
  for (;;) {
    uint64_t tail = r->tail.load(std::memory_order_acquire);
    uint64_t head = r->head.load(std::memory_order_acquire);
    if (tail < head) {
      Slot* s = slot_at(r, tail);
      double ts = s->timestamp;
      int64_t sq = s->seq;
      std::memcpy(out, reinterpret_cast<const uint8_t*>(s) + sizeof(Slot),
                  r->payload_bytes);
      uint64_t expect = tail;
      if (r->tail.compare_exchange_strong(expect, tail + 1)) {
        *timestamp = ts;
        *seq = sq;
        return 1;
      }
      continue;  // producer reclaimed the slot mid-copy; retry
    }
    if (std::chrono::steady_clock::now() > deadline) return 0;
    std::this_thread::yield();
  }
}

// Returns payload pointer or nullptr on timeout. timestamp/seq are output
// params. The slot stays owned by the consumer until modt_ring_release.
// ONLY safe on blocking-mode rings (see modt_ring_pop_copy).
const uint8_t* modt_ring_pop(Ring* r, double* timestamp, int64_t* seq,
                             double timeout_s) {
  auto deadline = std::chrono::steady_clock::now() +
                  std::chrono::duration<double>(timeout_s);
  for (;;) {
    uint64_t tail = r->tail.load(std::memory_order_relaxed);
    uint64_t head = r->head.load(std::memory_order_acquire);
    if (tail < head) {
      Slot* s = slot_at(r, tail);
      *timestamp = s->timestamp;
      *seq = s->seq;
      return reinterpret_cast<const uint8_t*>(s) + sizeof(Slot);
    }
    if (std::chrono::steady_clock::now() > deadline) return nullptr;
    std::this_thread::yield();
  }
}

void modt_ring_release(Ring* r) {
  r->tail.fetch_add(1, std::memory_order_release);
}

// PNG scanline defilter (data-loader hot path). The reference's image
// pipeline is native (cv_bridge/OpenCV, scene_flow_constructor.cpp:220-221);
// here zlib inflate runs at C speed through Python's zlib, but the
// per-pixel Sub/Average/Paeth reconstruction loops were Python — seconds
// per libpng-encoded KITTI frame. `raw` is the inflated IDAT stream
// (height * (1 + stride) bytes: filter byte + scanline); `out` receives
// height*stride reconstructed bytes. Returns 0, or -1 on short input /
// unknown filter type.
int modt_png_defilter(const uint8_t* raw, size_t raw_len, uint8_t* out,
                      size_t height, size_t stride, size_t bpp) {
  if (raw_len < height * (stride + 1) || bpp == 0) return -1;
  const uint8_t* prev = nullptr;
  for (size_t y = 0; y < height; ++y) {
    const uint8_t* in = raw + y * (stride + 1);
    uint8_t ftype = in[0];
    ++in;
    uint8_t* line = out + y * stride;
    switch (ftype) {
      case 0:
        std::memcpy(line, in, stride);
        break;
      case 1:  // Sub
        for (size_t x = 0; x < bpp; ++x) line[x] = in[x];
        for (size_t x = bpp; x < stride; ++x)
          line[x] = uint8_t(in[x] + line[x - bpp]);
        break;
      case 2:  // Up
        if (prev) {
          for (size_t x = 0; x < stride; ++x)
            line[x] = uint8_t(in[x] + prev[x]);
        } else {
          std::memcpy(line, in, stride);
        }
        break;
      case 3:  // Average
        for (size_t x = 0; x < stride; ++x) {
          unsigned left = x >= bpp ? line[x - bpp] : 0;
          unsigned up = prev ? prev[x] : 0;
          line[x] = uint8_t(in[x] + ((left + up) >> 1));
        }
        break;
      case 4:  // Paeth
        for (size_t x = 0; x < stride; ++x) {
          int a = x >= bpp ? line[x - bpp] : 0;
          int b = prev ? prev[x] : 0;
          int c = (prev && x >= bpp) ? prev[x - bpp] : 0;
          int p = a + b - c;
          int pa = p > a ? p - a : a - p;
          int pb = p > b ? p - b : b - p;
          int pc = p > c ? p - c : c - p;
          int pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
          line[x] = uint8_t(in[x] + pred);
        }
        break;
      default:
        return -1;
    }
    prev = line;
  }
  return 0;
}

}  // extern "C"
