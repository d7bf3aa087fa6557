// openmeters_tpu host ingest: multi-stream audio transport + batch assembly.
//
// Reference parity: src/infra/pipewire/transport.rs + src/meter.rs.  The
// reference connects one real-time producer (PipeWire callback) to one
// consumer (GUI frame clock) through a lock-free SPSC ring of pooled packets
// with a nanosecond timeline; gaps become Silence spans, overflow /
// discontinuity / format changes bump a fault epoch that the consumer turns
// into one Reset span; backlog beyond 1 s faults instead of replaying
// (transport.rs:15-37, 249-462, 475-656).  meter.rs re-chunks spans into
// rate-scaled DSP batches (256 frames @48k) and synthesizes bounded silence
// (meter.rs:15-80, 145-166).
//
// TPU formulation: N independent streams, each with its own SPSC ring and
// timeline, drained by one assembler that fills a fixed [n_streams,
// block_frames, channels] float32 batch per engine hop plus per-stream
// reset flags — the host half of the device pipeline.  One producer thread
// per stream and one assembler thread are supported without locks
// (atomic head/tail indices, acquire/release).
//
// C ABI only (consumed via ctypes).  No allocation on the producer path
// after setup.

#include <atomic>
#include <memory>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kNsPerSec = 1e9;

enum class SpanKind : uint8_t { Pcm = 0, Silence = 1 };

struct SpanRec {
  SpanKind kind;
  uint32_t frames;
  uint64_t start_ns;
  uint64_t data_pos;  // ring offset of first sample (Pcm only)
  uint64_t generation;
};

struct Stream {
  // --- configuration (immutable after create) ---
  uint32_t channels = 2;
  double sample_rate = 48000.0;

  // --- sample ring (SPSC: producer writes, assembler reads) ---
  std::vector<float> data;     // capacity samples (frames * channels)
  uint64_t data_cap = 0;       // in samples
  std::atomic<uint64_t> data_head{0};  // producer write position (samples)
  std::atomic<uint64_t> data_tail{0};  // consumer read position (samples)

  // --- span ring ---
  std::vector<SpanRec> spans;
  uint64_t span_cap = 0;
  std::atomic<uint64_t> span_head{0};
  std::atomic<uint64_t> span_tail{0};

  // --- shared state ---
  std::atomic<uint64_t> fault_epoch{0};
  std::atomic<uint64_t> generation{1};
  uint64_t seen_fault_epoch = 0;   // assembler-side
  uint64_t seen_generation = 0;    // assembler-side

  // producer-side timeline
  uint64_t next_ns = 0;
  bool timeline_started = false;

  // assembler-side carry: partially consumed span
  uint64_t carry_frames = 0;       // frames left in current span
  SpanRec carry_span{};
  bool has_carry = false;
  uint64_t pending_silence = 0;    // synthesized silence owed (frames)
};

struct Transport {
  uint32_t n_streams;
  uint32_t channels;       // padded batch channel count
  uint32_t block_frames;   // engine hop (B)
  uint64_t max_backlog_frames;
  uint64_t max_silence_frames;
  // unique_ptr storage: Stream holds atomics and must never move
  std::vector<std::unique_ptr<Stream>> streams;
};

inline uint64_t ns_to_frames(uint64_t ns, double rate) {
  return (uint64_t)((double)ns * rate / kNsPerSec + 0.5);
}
inline uint64_t frames_to_ns(uint64_t frames, double rate) {
  return (uint64_t)((double)frames * kNsPerSec / rate + 0.5);
}

void fault(Stream& s) { s.fault_epoch.fetch_add(1, std::memory_order_acq_rel); }

// Drop everything buffered for a stream (assembler side, after a fault).
void discard_all(Stream& s) {
  uint64_t span_head = s.span_head.load(std::memory_order_acquire);
  s.span_tail.store(span_head, std::memory_order_release);
  uint64_t data_head = s.data_head.load(std::memory_order_acquire);
  s.data_tail.store(data_head, std::memory_order_release);
  s.has_carry = false;
  s.carry_frames = 0;
  s.pending_silence = 0;
}

}  // namespace

extern "C" {

void* om_transport_create(uint32_t n_streams, uint32_t channels,
                          uint32_t block_frames, double default_rate,
                          double ring_seconds, double max_backlog_seconds,
                          double max_silence_seconds) {
  auto* t = new Transport();
  t->n_streams = n_streams;
  t->channels = channels;
  t->block_frames = block_frames;
  t->max_backlog_frames = (uint64_t)(max_backlog_seconds * default_rate);
  t->max_silence_frames = (uint64_t)(max_silence_seconds * default_rate);
  uint64_t cap_frames = (uint64_t)(ring_seconds * default_rate);
  t->streams.reserve(n_streams);
  for (uint32_t i = 0; i < n_streams; ++i) {
    auto s = std::make_unique<Stream>();
    s->channels = channels;
    s->sample_rate = default_rate;
    s->data_cap = cap_frames * channels;
    s->data.resize(s->data_cap);
    s->span_cap = 4096;
    s->spans.resize(s->span_cap);
    t->streams.push_back(std::move(s));
  }
  return t;
}

void om_transport_destroy(void* h) { delete static_cast<Transport*>(h); }

// Producer: push PCM with a nanosecond timestamp.  Gap > 1 frame becomes a
// Silence span; regression/overlap or ring overflow bumps the fault epoch
// (transport.rs:329-462 semantics).  NaN/Inf samples are sanitized to 0
// (transport.rs:249-261).
int32_t om_push_pcm(void* h, uint32_t stream, const float* samples,
                    uint32_t frames, uint64_t timestamp_ns) {
  auto* t = static_cast<Transport*>(h);
  if (stream >= t->n_streams || frames == 0) return -1;
  Stream& s = *t->streams[stream];
  const uint32_t ch = s.channels;
  const uint64_t need = (uint64_t)frames * ch;

  uint64_t start_ns = timestamp_ns;
  if (s.timeline_started) {
    if (timestamp_ns + frames_to_ns(1, s.sample_rate) < s.next_ns) {
      // time went backwards: discontinuity -> fault (transport.rs:432-446)
      fault(s);
      s.timeline_started = false;
    } else if (timestamp_ns > s.next_ns + frames_to_ns(1, s.sample_rate)) {
      // gap -> Silence span
      uint64_t gap_frames = ns_to_frames(timestamp_ns - s.next_ns, s.sample_rate);
      uint64_t span_head = s.span_head.load(std::memory_order_relaxed);
      uint64_t span_tail = s.span_tail.load(std::memory_order_acquire);
      if (span_head - span_tail >= s.span_cap) {
        fault(s);
        return -2;
      }
      SpanRec& rec = s.spans[span_head % s.span_cap];
      rec.kind = SpanKind::Silence;
      rec.frames = (uint32_t)gap_frames;
      rec.start_ns = s.next_ns;
      rec.generation = s.generation.load(std::memory_order_acquire);
      s.span_head.store(span_head + 1, std::memory_order_release);
    }
  }
  s.timeline_started = true;
  s.next_ns = start_ns + frames_to_ns(frames, s.sample_rate);

  uint64_t head = s.data_head.load(std::memory_order_relaxed);
  uint64_t tail = s.data_tail.load(std::memory_order_acquire);
  if (head + need - tail > s.data_cap) {
    fault(s);  // overflow: no replay, consumer resets (transport.rs:418-430)
    return -2;
  }
  uint64_t span_head = s.span_head.load(std::memory_order_relaxed);
  uint64_t span_tail = s.span_tail.load(std::memory_order_acquire);
  if (span_head - span_tail >= s.span_cap) {
    fault(s);
    return -2;
  }

  for (uint64_t i = 0; i < need; ++i) {
    float v = samples[i];
    s.data[(head + i) % s.data_cap] = std::isfinite(v) ? v : 0.0f;
  }
  s.data_head.store(head + need, std::memory_order_release);

  SpanRec& rec = s.spans[span_head % s.span_cap];
  rec.kind = SpanKind::Pcm;
  rec.frames = frames;
  rec.start_ns = start_ns;
  rec.data_pos = head;
  rec.generation = s.generation.load(std::memory_order_acquire);
  s.span_head.store(span_head + 1, std::memory_order_release);
  return 0;
}

// Producer: explicit silence (e.g. stream paused but alive).
int32_t om_push_silence(void* h, uint32_t stream, uint32_t frames,
                        uint64_t timestamp_ns) {
  auto* t = static_cast<Transport*>(h);
  if (stream >= t->n_streams) return -1;
  Stream& s = *t->streams[stream];
  uint64_t span_head = s.span_head.load(std::memory_order_relaxed);
  uint64_t span_tail = s.span_tail.load(std::memory_order_acquire);
  if (span_head - span_tail >= s.span_cap) {
    fault(s);
    return -2;
  }
  SpanRec& rec = s.spans[span_head % s.span_cap];
  rec.kind = SpanKind::Silence;
  rec.frames = frames;
  rec.start_ns = timestamp_ns;
  rec.generation = s.generation.load(std::memory_order_acquire);
  s.span_head.store(span_head + 1, std::memory_order_release);
  s.timeline_started = true;
  s.next_ns = timestamp_ns + frames_to_ns(frames, s.sample_rate);
  return 0;
}

// Producer: fault injection / stream error (stream.rs Fault classification).
void om_push_fault(void* h, uint32_t stream) {
  auto* t = static_cast<Transport*>(h);
  if (stream < t->n_streams) fault(*t->streams[stream]);
}

// Producer: format change bumps the generation (AudioFormat::generation).
void om_set_generation(void* h, uint32_t stream, uint64_t generation) {
  auto* t = static_cast<Transport*>(h);
  if (stream < t->n_streams)
    t->streams[stream]->generation.store(generation, std::memory_order_release);
}

uint64_t om_fault_count(void* h, uint32_t stream) {
  auto* t = static_cast<Transport*>(h);
  return stream < t->n_streams
             ? t->streams[stream]->fault_epoch.load(std::memory_order_acquire)
             : 0;
}

// Assembler: fill one [n_streams, block_frames, channels] float32 batch.
//
// Per stream, drains buffered spans into exactly block_frames frames:
// - Pcm spans copy samples (partially consumed spans carry over)
// - Silence spans fill zeros; synthesized silence beyond max_silence resets
// - fault-epoch or generation changes emit reset_mask=1 and drop the backlog
// - backlog greater than max_backlog faults (reset, no replay)
// - streams with no data underrun with silence and underrun_mask=1
//
// Returns the number of streams that produced real PCM this hop.
int32_t om_assemble(void* h, float* out, uint8_t* reset_mask,
                    uint8_t* underrun_mask) {
  auto* t = static_cast<Transport*>(h);
  const uint32_t B = t->block_frames;
  const uint32_t C = t->channels;
  int32_t live = 0;

  for (uint32_t si = 0; si < t->n_streams; ++si) {
    Stream& s = *t->streams[si];
    float* dst = out + (size_t)si * B * C;
    std::memset(dst, 0, sizeof(float) * B * C);
    reset_mask[si] = 0;
    underrun_mask[si] = 0;

    // fault epoch -> one Reset (synchronize_fault, transport.rs:561-571)
    uint64_t epoch = s.fault_epoch.load(std::memory_order_acquire);
    if (epoch != s.seen_fault_epoch) {
      s.seen_fault_epoch = epoch;
      discard_all(s);
      reset_mask[si] = 1;
    }

    // backlog cap: more than max_backlog buffered -> reset instead of replay
    {
      uint64_t head = s.data_head.load(std::memory_order_acquire);
      uint64_t tail = s.data_tail.load(std::memory_order_relaxed);
      if ((head - tail) / s.channels > t->max_backlog_frames) {
        discard_all(s);
        reset_mask[si] = 1;
      }
    }

    uint32_t filled = 0;
    bool got_pcm = false;
    while (filled < B) {
      if (!s.has_carry) {
        uint64_t span_tail = s.span_tail.load(std::memory_order_relaxed);
        uint64_t span_head = s.span_head.load(std::memory_order_acquire);
        if (span_tail == span_head) break;  // nothing buffered
        s.carry_span = s.spans[span_tail % s.span_cap];
        s.span_tail.store(span_tail + 1, std::memory_order_release);
        s.carry_frames = s.carry_span.frames;
        s.has_carry = true;

        // generation change resets processors (registry.rs:400-406)
        if (s.carry_span.generation != s.seen_generation) {
          s.seen_generation = s.carry_span.generation;
          reset_mask[si] = 1;
        }
        // long silence resets instead of replaying (meter.rs:145-166)
        if (s.carry_span.kind == SpanKind::Silence &&
            s.carry_frames > t->max_silence_frames) {
          s.has_carry = false;
          reset_mask[si] = 1;
          continue;
        }
      }

      uint32_t take = (uint32_t)std::min<uint64_t>(s.carry_frames, B - filled);
      if (s.carry_span.kind == SpanKind::Pcm) {
        uint64_t pos = s.carry_span.data_pos +
                       (uint64_t)(s.carry_span.frames - s.carry_frames) * s.channels;
        for (uint32_t f = 0; f < take; ++f) {
          for (uint32_t c = 0; c < s.channels && c < C; ++c) {
            dst[(size_t)(filled + f) * C + c] =
                s.data[(pos + (uint64_t)f * s.channels + c) % s.data_cap];
          }
        }
        s.data_tail.fetch_add((uint64_t)take * s.channels,
                              std::memory_order_release);
        got_pcm = true;
      }
      // Silence spans leave zeros.
      filled += take;
      s.carry_frames -= take;
      if (s.carry_frames == 0) s.has_carry = false;
    }

    if (filled < B) underrun_mask[si] = 1;  // idle watchdog: silence fill
    if (got_pcm) ++live;
  }
  return live;
}

// Frames currently buffered for a stream (diagnostics).
uint64_t om_buffered_frames(void* h, uint32_t stream) {
  auto* t = static_cast<Transport*>(h);
  if (stream >= t->n_streams) return 0;
  Stream& s = *t->streams[stream];
  uint64_t head = s.data_head.load(std::memory_order_acquire);
  uint64_t tail = s.data_tail.load(std::memory_order_acquire);
  return (head - tail) / s.channels + s.carry_frames;
}

}  // extern "C"
