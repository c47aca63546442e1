// groove_native: native runtime services for groove_tpu.
//
// The reference's runtime around the DSP engine is native Rust: a cpal
// audio callback pulling frames from the engine through a ring buffer
// (src/panels/audio_panel.rs:75-142, legacy/audio_panel.rs:66-111) and a
// hound WAV writer (orchestration/src/helpers.rs:74-97). This file is the
// C++ equivalent: a lock-free SPSC ring buffer + streaming audio service
// with a pluggable sink, and a fast 16-bit WAV encode/decode path.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: native/build.sh  ->  native/libgroove_native.so

#include <atomic>
#include <chrono>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <thread>

extern "C" {

// ---------------------------------------------------------------------------
// SPSC ring buffer of stereo float frames.

struct RingBuffer {
  float* data;          // interleaved stereo
  size_t capacity;      // frames
  std::atomic<size_t> head;  // write index (frames)
  std::atomic<size_t> tail;  // read index (frames)
};

RingBuffer* rb_create(size_t capacity_frames) {
  auto* rb = new RingBuffer();
  rb->data = new float[capacity_frames * 2]();
  rb->capacity = capacity_frames;
  rb->head.store(0);
  rb->tail.store(0);
  return rb;
}

void rb_destroy(RingBuffer* rb) {
  if (!rb) return;
  delete[] rb->data;
  delete rb;
}

size_t rb_readable(const RingBuffer* rb) {
  if (!rb) return 0;
  // Observer-safe order: load tail BEFORE head. head only grows, so a
  // stale tail under-reports; loading head first lets a third thread see
  // tail advance past the sampled head and wrap the size_t difference.
  size_t tail = rb->tail.load(std::memory_order_acquire);
  size_t head = rb->head.load(std::memory_order_acquire);
  return head - tail;
}

size_t rb_writable(const RingBuffer* rb) {
  if (!rb) return 0;
  return rb->capacity - rb_readable(rb);
}

// Returns frames actually written (drops the remainder when full).
size_t rb_write(RingBuffer* rb, const float* frames, size_t n_frames) {
  if (!rb || !frames) return 0;
  size_t head = rb->head.load(std::memory_order_relaxed);
  size_t free_frames = rb->capacity -
      (head - rb->tail.load(std::memory_order_acquire));
  if (n_frames > free_frames) n_frames = free_frames;
  for (size_t i = 0; i < n_frames; ++i) {
    size_t idx = ((head + i) % rb->capacity) * 2;
    rb->data[idx] = frames[i * 2];
    rb->data[idx + 1] = frames[i * 2 + 1];
  }
  rb->head.store(head + n_frames, std::memory_order_release);
  return n_frames;
}

// Returns frames actually read; missing frames are zero-filled (underrun),
// matching the callback contract of an audio device (silence on starvation).
size_t rb_read(RingBuffer* rb, float* out, size_t n_frames) {
  if (!rb || !out) return 0;
  size_t tail = rb->tail.load(std::memory_order_relaxed);
  size_t avail = rb->head.load(std::memory_order_acquire) - tail;
  size_t take = n_frames < avail ? n_frames : avail;
  for (size_t i = 0; i < take; ++i) {
    size_t idx = ((tail + i) % rb->capacity) * 2;
    out[i * 2] = rb->data[idx];
    out[i * 2 + 1] = rb->data[idx + 1];
  }
  for (size_t i = take; i < n_frames; ++i) {
    out[i * 2] = 0.0f;
    out[i * 2 + 1] = 0.0f;
  }
  rb->tail.store(tail + take, std::memory_order_release);
  return take;
}

// ---------------------------------------------------------------------------
// Audio service: a consumer thread pulls fixed-size buffers from the ring at
// the configured sample rate and hands them to a sink. Sinks: null (timed
// discard — keeps realtime pacing for tests/headless), raw file append.
// The host (Python) is the producer, mirroring the reference's
// NeedsAudioFn pull model: the service reports how many frames it wants.

struct AudioService {
  RingBuffer* rb;
  std::thread thread;
  std::atomic<bool> running;
  std::atomic<uint64_t> frames_consumed;
  std::atomic<uint64_t> underruns;
  int sample_rate;
  int buffer_frames;
  int lead_buffers;  // NeedsAudio target, in buffers
  FILE* sink_file;   // nullptr -> null sink
};

static void service_loop(AudioService* svc) {
  const auto buf_duration = std::chrono::duration<double>(
      static_cast<double>(svc->buffer_frames) / svc->sample_rate);
  auto next = std::chrono::steady_clock::now();
  float* buf = new float[svc->buffer_frames * 2];
  while (svc->running.load(std::memory_order_acquire)) {
    next += std::chrono::duration_cast<std::chrono::steady_clock::duration>(
        buf_duration);
    size_t got = rb_read(svc->rb, buf, svc->buffer_frames);
    if (got < static_cast<size_t>(svc->buffer_frames)) {
      svc->underruns.fetch_add(1);
    }
    svc->frames_consumed.fetch_add(svc->buffer_frames);
    if (svc->sink_file) {
      fwrite(buf, sizeof(float), svc->buffer_frames * 2, svc->sink_file);
    }
    std::this_thread::sleep_until(next);
  }
  delete[] buf;
}

// Returns nullptr when a requested file sink cannot be opened (the caller
// asked for capture; silently discarding frames would lose it).
AudioService* audio_service_start(RingBuffer* rb, int sample_rate,
                                  int buffer_frames, const char* sink_path,
                                  int lead_buffers) {
  auto* svc = new AudioService();
  svc->rb = rb;
  svc->running.store(true);
  svc->frames_consumed.store(0);
  svc->underruns.store(0);
  svc->sample_rate = sample_rate;
  svc->buffer_frames = buffer_frames;
  svc->lead_buffers = lead_buffers > 0 ? lead_buffers : 4;
  if (sink_path && sink_path[0]) {
    svc->sink_file = fopen(sink_path, "wb");
    if (!svc->sink_file) {
      delete svc;
      return nullptr;
    }
  } else {
    svc->sink_file = nullptr;
  }
  svc->thread = std::thread(service_loop, svc);
  return svc;
}

uint64_t audio_service_frames_consumed(AudioService* svc) {
  return svc ? svc->frames_consumed.load() : 0;
}

uint64_t audio_service_underruns(AudioService* svc) {
  return svc ? svc->underruns.load() : 0;
}

// Frames the service wants buffered (the NeedsAudio count): keep
// `lead_buffers` buffers queued (default 4) — the latency bound.
int64_t audio_service_needs_frames(AudioService* svc) {
  if (!svc) return 0;
  int64_t target =
      static_cast<int64_t>(svc->buffer_frames) * svc->lead_buffers;
  int64_t have = static_cast<int64_t>(rb_readable(svc->rb));
  return target > have ? target - have : 0;
}

void audio_service_stop(AudioService* svc) {
  if (!svc) return;
  svc->running.store(false, std::memory_order_release);
  if (svc->thread.joinable()) svc->thread.join();
  if (svc->sink_file) fclose(svc->sink_file);
  delete svc;
}

// ---------------------------------------------------------------------------
// WAV 16-bit encode/decode fast path (hound-equivalent subset).
// Encode: float stereo [n*2] -> i16 with trunc-toward-zero + saturation
// (Rust `as i16` semantics, helpers.rs:78-92).

// Returns 0 on success, -1 on open/write/close failure (short write, disk
// full), -2 when the payload cannot be represented in a RIFF uint32 header
// (n_frames*4 >= 2^32-44 would silently wrap) — callers fall back or report.
int wav_write_16bit_stereo(const char* path, const float* interleaved,
                           int64_t n_frames, int sample_rate) {
  if (n_frames < 0 ||
      static_cast<uint64_t>(n_frames) * 4u > 0xFFFFFFFFull - 44u) {
    return -2;
  }
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  const uint32_t data_bytes = static_cast<uint32_t>(n_frames * 2 * 2);
  uint8_t header[44];
  memcpy(header, "RIFF", 4);
  uint32_t riff = 36 + data_bytes;
  memcpy(header + 4, &riff, 4);
  memcpy(header + 8, "WAVEfmt ", 8);
  uint32_t fmt_size = 16;
  memcpy(header + 16, &fmt_size, 4);
  uint16_t fmt_tag = 1, channels = 2, bits = 16;
  uint32_t rate = static_cast<uint32_t>(sample_rate);
  uint32_t byte_rate = rate * channels * (bits / 8);
  uint16_t block_align = channels * (bits / 8);
  memcpy(header + 20, &fmt_tag, 2);
  memcpy(header + 22, &channels, 2);
  memcpy(header + 24, &rate, 4);
  memcpy(header + 28, &byte_rate, 4);
  memcpy(header + 32, &block_align, 2);
  memcpy(header + 34, &bits, 2);
  memcpy(header + 36, "data", 4);
  memcpy(header + 40, &data_bytes, 4);
  bool ok = fwrite(header, 1, 44, f) == 44;

  const int64_t chunk = 1 << 16;
  int16_t* buf = new int16_t[chunk * 2];
  for (int64_t start = 0; ok && start < n_frames; start += chunk) {
    int64_t n = n_frames - start < chunk ? n_frames - start : chunk;
    for (int64_t i = 0; i < n * 2; ++i) {
      double scaled = std::trunc(
          static_cast<double>(interleaved[(start * 2) + i]) * 32767.0);
      if (scaled > 32767.0) scaled = 32767.0;
      if (scaled < -32768.0) scaled = -32768.0;
      buf[i] = static_cast<int16_t>(scaled);
    }
    ok = fwrite(buf, sizeof(int16_t), static_cast<size_t>(n * 2), f) ==
         static_cast<size_t>(n * 2);
  }
  delete[] buf;
  if (fclose(f) != 0) ok = false;  // flush can surface ENOSPC here
  return ok ? 0 : -1;
}

}  // extern "C"
