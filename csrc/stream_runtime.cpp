// Native streaming serving runtime: lock-free per-stream ring buffers and
// batch gather/scatter for the jitted streaming step.
//
// The reference demo improvised an SPSC queue from Python lists + polling
// (egs/tse/demo/demo_app.py:285-335, flagged in SURVEY.md §5.2). This is
// the production-shaped replacement: each stream owns an input ring (single
// producer: the client thread) and an output ring (single consumer: the
// client thread); the serving loop (single thread) gathers hop-aligned
// chunks from every ready stream into one contiguous batch for the TPU
// step and scatters results back. All rings are lock-free SPSC (acquire/
// release atomics), so feeders never block the serving loop.
//
// Build: make -C csrc  (part of libpuresound_audio.so)

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <new>

namespace {

struct Ring {
  float* data = nullptr;
  size_t capacity = 0;  // power of two
  std::atomic<uint64_t> head{0};  // write position (producer)
  std::atomic<uint64_t> tail{0};  // read position (consumer)

  void init(size_t cap) {
    capacity = 1;
    while (capacity < cap) capacity <<= 1;
    data = static_cast<float*>(malloc(sizeof(float) * capacity));
  }
  ~Ring() { free(data); }

  size_t available() const {
    return static_cast<size_t>(head.load(std::memory_order_acquire) -
                               tail.load(std::memory_order_acquire));
  }
  size_t space() const { return capacity - available(); }

  size_t push(const float* src, size_t n) {
    size_t free_n = space();
    if (n > free_n) n = free_n;
    uint64_t h = head.load(std::memory_order_relaxed);
    for (size_t i = 0; i < n; i++)
      data[(h + i) & (capacity - 1)] = src[i];
    head.store(h + n, std::memory_order_release);
    return n;
  }

  size_t pop(float* dst, size_t n) {
    size_t avail = available();
    if (n > avail) n = avail;
    uint64_t t = tail.load(std::memory_order_relaxed);
    for (size_t i = 0; i < n; i++)
      dst[i] = data[(t + i) & (capacity - 1)];
    tail.store(t + n, std::memory_order_release);
    return n;
  }
};

struct Hub {
  int n_streams;
  Ring* in_rings;
  Ring* out_rings;
  // samples hub_scatter had to drop because a slot's output ring was full
  // (client not draining): surfaced so the server can report a violated
  // delivery contract instead of silently returning short output
  std::atomic<uint64_t>* out_drops;
};

}  // namespace

extern "C" {

void* hub_create(int n_streams, size_t ring_capacity) {
  Hub* hub = new Hub;
  hub->n_streams = n_streams;
  hub->in_rings = new Ring[n_streams];
  hub->out_rings = new Ring[n_streams];
  hub->out_drops = new std::atomic<uint64_t>[n_streams];
  for (int i = 0; i < n_streams; i++) {
    hub->in_rings[i].init(ring_capacity);
    hub->out_rings[i].init(ring_capacity);
    hub->out_drops[i].store(0, std::memory_order_relaxed);
  }
  return hub;
}

void hub_destroy(void* h) {
  Hub* hub = static_cast<Hub*>(h);
  delete[] hub->in_rings;
  delete[] hub->out_rings;
  delete[] hub->out_drops;
  delete hub;
}

// Producer side: feed samples into stream `sid`'s input ring.
// Returns samples accepted (may be < n when the ring is full).
int64_t hub_push_input(void* h, int sid, const float* src, int64_t n) {
  Hub* hub = static_cast<Hub*>(h);
  return static_cast<int64_t>(hub->in_rings[sid].push(src, (size_t)n));
}

// Consumer side: pop enhanced samples from stream `sid`'s output ring.
int64_t hub_pop_output(void* h, int sid, float* dst, int64_t n) {
  Hub* hub = static_cast<Hub*>(h);
  return static_cast<int64_t>(hub->out_rings[sid].pop(dst, (size_t)n));
}

int64_t hub_input_available(void* h, int sid) {
  Hub* hub = static_cast<Hub*>(h);
  return static_cast<int64_t>(hub->in_rings[sid].available());
}

int64_t hub_output_available(void* h, int sid) {
  Hub* hub = static_cast<Hub*>(h);
  return static_cast<int64_t>(hub->out_rings[sid].available());
}

// Session lifecycle: drop everything buffered in stream `sid`'s rings so a
// new client can take over the slot. Must be called from the serving-loop
// side while the slot's client threads are quiescent (i.e. after detach /
// before the next client starts feeding): the input ring's drain moves the
// consumer cursor (serving loop IS the consumer), but the output ring's
// drain moves a cursor normally owned by the client thread.
void hub_reset_stream(void* h, int sid) {
  Hub* hub = static_cast<Hub*>(h);
  Ring& in = hub->in_rings[sid];
  Ring& out = hub->out_rings[sid];
  in.tail.store(in.head.load(std::memory_order_acquire),
                std::memory_order_release);
  out.tail.store(out.head.load(std::memory_order_acquire),
                 std::memory_order_release);
  hub->out_drops[sid].store(0, std::memory_order_release);
}

// Samples dropped by hub_scatter on stream `sid` since attach/reset.
int64_t hub_output_dropped(void* h, int sid) {
  Hub* hub = static_cast<Hub*>(h);
  return static_cast<int64_t>(
      hub->out_drops[sid].load(std::memory_order_acquire));
}

// Serving loop: gather one `chunk`-sample frame from every stream into the
// contiguous batch matrix `out` [n_streams, chunk]. Streams with fewer than
// `chunk` samples buffered contribute zeros (real-time underrun semantics);
// `ready_mask` (len n_streams, int8) records which rows carry real audio.
// Returns the number of ready streams.
int hub_gather(void* h, int64_t chunk, float* out, int8_t* ready_mask) {
  Hub* hub = static_cast<Hub*>(h);
  int ready = 0;
  for (int i = 0; i < hub->n_streams; i++) {
    float* row = out + (size_t)i * (size_t)chunk;
    if (hub->in_rings[i].available() >= (size_t)chunk) {
      hub->in_rings[i].pop(row, (size_t)chunk);
      ready_mask[i] = 1;
      ready++;
    } else {
      memset(row, 0, sizeof(float) * (size_t)chunk);
      ready_mask[i] = 0;
    }
  }
  return ready;
}

// Serving loop: scatter the step output [n_streams, chunk] back to the
// per-stream output rings (only rows marked ready).
void hub_scatter(void* h, int64_t chunk, const float* batch,
                 const int8_t* ready_mask) {
  Hub* hub = static_cast<Hub*>(h);
  for (int i = 0; i < hub->n_streams; i++) {
    if (ready_mask[i]) {
      size_t pushed = hub->out_rings[i].push(
          batch + (size_t)i * (size_t)chunk, (size_t)chunk);
      if (pushed < (size_t)chunk)
        hub->out_drops[i].fetch_add((size_t)chunk - pushed,
                                    std::memory_order_acq_rel);
    }
  }
}

}  // extern "C"
