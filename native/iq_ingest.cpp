// Host-side IQ ingest: lock-free SPSC ring buffer + TCP reader thread.
//
// TPU-native equivalent of the reference's native sample transport
// (pycsdr Buffer/TcpSource and the nmux multiplexer, SURVEY §2.3-A/B/G):
// a background thread drains the SDR driver's TCP socket (or any fd) into
// a power-of-two ring of complex64 samples with format conversion done
// in-place (u8 / s16 / f32 interleaved IQ → float32 pairs), and the
// Python runtime pulls fixed-size blocks for jax.device_put.  The ring
// absorbs jitter between the network and the accelerator step cadence
// without the GIL in the hot path.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

namespace {

struct Ring {
    float* data;          // interleaved I/Q floats, capacity*2 entries
    uint64_t capacity;    // samples (power of two)
    uint64_t mask;
    std::atomic<uint64_t> head;  // written samples (producer)
    std::atomic<uint64_t> tail;  // consumed samples (consumer)
    std::atomic<uint64_t> overruns;
    std::atomic<bool> running;
    std::atomic<bool> eof;
    std::atomic<bool> blocking;  // backpressure instead of drop-oldest
    int fd;
    int format;           // 0=f32, 1=s16, 2=u8 (rtl_sdr style)
    std::thread reader;
};

uint64_t next_pow2(uint64_t v) {
    uint64_t p = 1;
    while (p < v) p <<= 1;
    return p;
}

// write n complex samples (already float) into the ring.  Default
// streaming semantics: drop the OLDEST data on overrun (live SDRs — fresh
// samples win).  In blocking mode (file replay / bench feeds) the writer
// waits for space instead, so pipe backpressure reaches the producer and
// no CPU is burned converting samples that would be dropped.
void ring_write_chunk(Ring* r, const float* iq, uint64_t n) {
    uint64_t head = r->head.load(std::memory_order_relaxed);
    uint64_t tail = r->tail.load(std::memory_order_acquire);
    if (head + n - tail > r->capacity) {
        if (r->blocking.load(std::memory_order_relaxed)) {
            do {
                if (!r->running.load(std::memory_order_relaxed)) return;
                usleep(500);
                tail = r->tail.load(std::memory_order_acquire);
            } while (head + n - tail > r->capacity);
        } else {
            // consumer too slow: advance tail (drop oldest), count overrun
            uint64_t excess = head + n - tail - r->capacity;
            r->tail.store(tail + excess, std::memory_order_release);
            r->overruns.fetch_add(1, std::memory_order_relaxed);
        }
    }
    // at most two contiguous segments (wrap) — plain memcpy, vectorized
    uint64_t start = head & r->mask;
    uint64_t first = r->capacity - start;
    if (first > n) first = n;
    memcpy(r->data + start * 2, iq, first * 2 * sizeof(float));
    if (n > first)
        memcpy(r->data, iq + first * 2, (n - first) * 2 * sizeof(float));
    r->head.store(head + n, std::memory_order_release);
}

void ring_write(Ring* r, const float* iq, uint64_t n) {
    // a chunk larger than the whole ring (tiny rings in tests) must be
    // written in ring-sized pieces or the segment copies run off the end
    while (n > r->capacity) {
        ring_write_chunk(r, iq, r->capacity);
        iq += r->capacity * 2;
        n -= r->capacity;
    }
    if (n) ring_write_chunk(r, iq, n);
}

constexpr size_t CHUNK = 1 << 16;  // bytes per read

void reader_loop(Ring* r) {
    char* buf = static_cast<char*>(malloc(CHUNK + 8));
    float* conv = static_cast<float*>(malloc(CHUNK * sizeof(float)));
    size_t pending = 0;  // leftover bytes of an incomplete sample
    const size_t sample_bytes = r->format == 0 ? 8 : (r->format == 1 ? 4 : 2);
    while (r->running.load(std::memory_order_relaxed)) {
        ssize_t got = read(r->fd, buf + pending, CHUNK - pending);
        if (got <= 0) {
            if (got == 0) { r->eof.store(true); break; }
            if (errno == EINTR || errno == EAGAIN || errno == EWOULDBLOCK) continue;
            r->eof.store(true);
            break;
        }
        size_t avail = pending + static_cast<size_t>(got);
        size_t nsamp = avail / sample_bytes;
        size_t used = nsamp * sample_bytes;
        if (nsamp > 0) {
            if (r->format == 0) {
                ring_write(r, reinterpret_cast<float*>(buf), nsamp);
            } else if (r->format == 1) {
                const int16_t* s = reinterpret_cast<int16_t*>(buf);
                for (size_t i = 0; i < nsamp * 2; i++)
                    conv[i] = s[i] * (1.0f / 32768.0f);
                ring_write(r, conv, nsamp);
            } else {
                const uint8_t* s = reinterpret_cast<uint8_t*>(buf);
                for (size_t i = 0; i < nsamp * 2; i++)
                    conv[i] = (s[i] - 127.4f) * (1.0f / 128.0f);
                ring_write(r, conv, nsamp);
            }
        }
        pending = avail - used;
        if (pending) memmove(buf, buf + used, pending);
    }
    free(buf);
    free(conv);
}

}  // namespace

extern "C" {

int iq_ring_start_fd(Ring* r, int fd, int format);

// capacity_samples is rounded up to a power of two
Ring* iq_ring_create(uint64_t capacity_samples) {
    Ring* r = new Ring();
    r->capacity = next_pow2(capacity_samples);
    r->mask = r->capacity - 1;
    r->data = static_cast<float*>(malloc(r->capacity * 2 * sizeof(float)));
    r->head = 0;
    r->tail = 0;
    r->overruns = 0;
    r->running = false;
    r->eof = false;
    r->blocking = false;
    r->fd = -1;
    return r;
}

// connect to host:port and start draining it; format 0=f32 1=s16 2=u8
int iq_ring_connect(Ring* r, const char* host, int port, int format) {
    addrinfo hints = {};
    hints.ai_family = AF_UNSPEC;
    hints.ai_socktype = SOCK_STREAM;
    addrinfo* res = nullptr;
    char portstr[16];
    snprintf(portstr, sizeof portstr, "%d", port);
    if (getaddrinfo(host, portstr, &hints, &res) != 0 || res == nullptr)
        return -1;
    int fd = socket(res->ai_family, res->ai_socktype, res->ai_protocol);
    if (fd < 0) { freeaddrinfo(res); return -1; }
    if (connect(fd, res->ai_addr, res->ai_addrlen) != 0) {
        freeaddrinfo(res);
        close(fd);
        return -1;
    }
    freeaddrinfo(res);
    return iq_ring_start_fd(r, fd, format);
}

// start draining an existing fd (pipes work too)
int iq_ring_start_fd(Ring* r, int fd, int format) {
    if (r->running.load()) return -1;
    r->fd = fd;
    r->format = format;
    r->eof = false;
    r->running = true;
    r->reader = std::thread(reader_loop, r);
    return 0;
}

// blocking read of exactly n samples into out (interleaved float32 I/Q);
// returns samples read (n, or less on EOF/stop), spinning with short
// sleeps while waiting
uint64_t iq_ring_read(Ring* r, float* out, uint64_t n, int timeout_ms) {
    uint64_t deadline_spins = static_cast<uint64_t>(timeout_ms) * 10;
    uint64_t spins = 0;
    uint64_t done = 0;
    while (done < n) {
        uint64_t head = r->head.load(std::memory_order_acquire);
        uint64_t tail = r->tail.load(std::memory_order_relaxed);
        uint64_t avail = head - tail;
        if (avail == 0) {
            if (r->eof.load() || !r->running.load()) break;
            if (++spins > deadline_spins) break;
            usleep(100);
            continue;
        }
        uint64_t take = avail < (n - done) ? avail : (n - done);
        uint64_t start = tail & r->mask;
        uint64_t first = r->capacity - start;
        if (first > take) first = take;
        memcpy(out + done * 2, r->data + start * 2,
               first * 2 * sizeof(float));
        if (take > first)
            memcpy(out + (done + first) * 2, r->data,
                   (take - first) * 2 * sizeof(float));
        r->tail.store(tail + take, std::memory_order_release);
        done += take;
    }
    return done;
}

// like iq_ring_read but emits int16 wire samples (clamped ±1.0 → ±32767):
// the host→TPU transfer of a block is then half the bytes of float32 —
// the production transport for s16-native SDRs, converted to float on the
// accelerator itself (runtime/chain.py _unpack_leaf)
uint64_t iq_ring_read_s16(Ring* r, int16_t* out, uint64_t n, int timeout_ms) {
    uint64_t deadline_spins = static_cast<uint64_t>(timeout_ms) * 10;
    uint64_t spins = 0;
    uint64_t done = 0;
    while (done < n) {
        uint64_t head = r->head.load(std::memory_order_acquire);
        uint64_t tail = r->tail.load(std::memory_order_relaxed);
        uint64_t avail = head - tail;
        if (avail == 0) {
            if (r->eof.load() || !r->running.load()) break;
            if (++spins > deadline_spins) break;
            usleep(100);
            continue;
        }
        uint64_t take = avail < (n - done) ? avail : (n - done);
        // two contiguous segments; tight branchless loop auto-vectorizes
        uint64_t start = tail & r->mask;
        uint64_t first = r->capacity - start;
        if (first > take) first = take;
        const float* seg = r->data + start * 2;
        int16_t* dst = out + done * 2;
        uint64_t m1 = first * 2, m2 = (take - first) * 2;
        for (uint64_t i = 0; i < m1; i++) {
            float v = seg[i] * 32768.0f;
            v = v > 32767.0f ? 32767.0f : v;
            v = v < -32768.0f ? -32768.0f : v;
            dst[i] = static_cast<int16_t>(v);
        }
        seg = r->data;
        dst = out + (done + first) * 2;
        for (uint64_t i = 0; i < m2; i++) {
            float v = seg[i] * 32768.0f;
            v = v > 32767.0f ? 32767.0f : v;
            v = v < -32768.0f ? -32768.0f : v;
            dst[i] = static_cast<int16_t>(v);
        }
        r->tail.store(tail + take, std::memory_order_release);
        done += take;
    }
    return done;
}

void iq_ring_set_blocking(Ring* r, int blocking) {
    r->blocking.store(blocking != 0);
}

// like iq_ring_read but emits uint8 wire samples (rtl-sdr convention:
// ±1.0 ↔ 127.4±128) — QUARTER the host→accelerator bytes of float32;
// the jit boundary converts back to float on the device
// (runtime/chain.py _unpack_leaf)
uint64_t iq_ring_read_u8(Ring* r, uint8_t* out, uint64_t n, int timeout_ms) {
    uint64_t deadline_spins = static_cast<uint64_t>(timeout_ms) * 10;
    uint64_t spins = 0;
    uint64_t done = 0;
    while (done < n) {
        uint64_t head = r->head.load(std::memory_order_acquire);
        uint64_t tail = r->tail.load(std::memory_order_relaxed);
        uint64_t avail = head - tail;
        if (avail == 0) {
            if (r->eof.load() || !r->running.load()) break;
            if (++spins > deadline_spins) break;
            usleep(100);
            continue;
        }
        uint64_t take = avail < (n - done) ? avail : (n - done);
        uint64_t start = tail & r->mask;
        uint64_t first = r->capacity - start;
        if (first > take) first = take;
        const float* seg = r->data + start * 2;
        uint8_t* dst = out + done * 2;
        uint64_t m1 = first * 2, m2 = (take - first) * 2;
        for (uint64_t i = 0; i < m1; i++) {
            float v = seg[i] * 128.0f + 127.4f;
            v = v > 255.0f ? 255.0f : v;
            v = v < 0.0f ? 0.0f : v;
            dst[i] = static_cast<uint8_t>(v);
        }
        seg = r->data;
        dst = out + (done + first) * 2;
        for (uint64_t i = 0; i < m2; i++) {
            float v = seg[i] * 128.0f + 127.4f;
            v = v > 255.0f ? 255.0f : v;
            v = v < 0.0f ? 0.0f : v;
            dst[i] = static_cast<uint8_t>(v);
        }
        r->tail.store(tail + take, std::memory_order_release);
        done += take;
    }
    return done;
}

uint64_t iq_ring_available(Ring* r) {
    return r->head.load(std::memory_order_acquire) -
           r->tail.load(std::memory_order_relaxed);
}

uint64_t iq_ring_overruns(Ring* r) { return r->overruns.load(); }

int iq_ring_eof(Ring* r) { return r->eof.load() ? 1 : 0; }

void iq_ring_stop(Ring* r) {
    if (r->running.exchange(false)) {
        if (r->fd >= 0) {
            shutdown(r->fd, SHUT_RDWR);
        }
        if (r->reader.joinable()) r->reader.join();
        if (r->fd >= 0) { close(r->fd); r->fd = -1; }
    }
}

void iq_ring_destroy(Ring* r) {
    iq_ring_stop(r);
    free(r->data);
    delete r;
}

}  // extern "C"
