// Native host core: Keccak-f[1600] + STROBE-128 duplex (Merlin transcript).
//
// The Fiat-Shamir transcript is strictly sequential host work (SURVEY.md §7
// "Fiat-Shamir host<->device ping-pong"); the reference runs it natively via
// the Rust `merlin`/`keccak` crates (/root/reference/Cargo.lock:399-407,366).
// This is the equivalent native layer for the TPU framework: a C ABI consumed
// from Python through ctypes (dusk_blindbidproof_tpu/utils/native.py), with
// the pure-Python implementation in utils/{keccak,merlin}.py kept as the
// bit-exactness cross-check (tests/test_transcript.py).
//
// Semantics mirror STROBE-128 as instantiated inside merlin 1.3.0:
//   security 128 -> rate R = 200 - 32 - 2 = 166 bytes,
//   ops used: meta_AD, AD, PRF, KEY; no transport ops.

#include <cstdint>
#include <cstring>

namespace {

constexpr int kRate = 166;  // STROBE-128 rate in bytes

constexpr uint64_t kRC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808AULL,
    0x8000000080008000ULL, 0x000000000000808BULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008AULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000AULL,
    0x000000008000808BULL, 0x800000000000008BULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800AULL, 0x800000008000000AULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL,
};

inline uint64_t rotl(uint64_t v, int r) { return (v << r) | (v >> (64 - r)); }

void keccak_f1600(uint64_t a[25]) {
  for (int round = 0; round < 24; ++round) {
    // theta
    uint64_t c[5], d[5];
    for (int x = 0; x < 5; ++x)
      c[x] = a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20];
    for (int x = 0; x < 5; ++x) c[x] ^= 0;  // keep symmetry with spec below
    for (int x = 0; x < 5; ++x)
      d[x] = c[(x + 4) % 5] ^ rotl(c[(x + 1) % 5], 1);
    for (int i = 0; i < 25; ++i) a[i] ^= d[i % 5];
    // rho + pi (rotation offsets per FIPS 202 §3.2.2, lane index x + 5*y)
    static constexpr int kRot[25] = {0,  1,  62, 28, 27, 36, 44, 6,  55,
                                     20, 3,  10, 43, 25, 39, 41, 45, 15,
                                     21, 8,  18, 2,  61, 56, 14};
    uint64_t b[25];
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y) {
        int src = x + 5 * y;
        int dst = y + 5 * ((2 * x + 3 * y) % 5);
        b[dst] = kRot[src] ? rotl(a[src], kRot[src]) : a[src];
      }
    // chi
    for (int y = 0; y < 5; ++y)
      for (int x = 0; x < 5; ++x)
        a[x + 5 * y] =
            b[x + 5 * y] ^ (~b[(x + 1) % 5 + 5 * y] & b[(x + 2) % 5 + 5 * y]);
    // iota
    a[0] ^= kRC[round];
  }
}

}  // namespace

extern "C" {

// Layout must match the ctypes Structure in utils/native.py.
struct Strobe128 {
  uint8_t state[200];
  uint8_t pos;
  uint8_t pos_begin;
  uint8_t cur_flags;
};

enum Flags : uint8_t {
  FLAG_I = 1,
  FLAG_A = 1 << 1,
  FLAG_C = 1 << 2,
  FLAG_T = 1 << 3,
  FLAG_M = 1 << 4,
  FLAG_K = 1 << 5,
};

void bb_keccak_f1600(uint8_t state[200]) {
  uint64_t lanes[25];
  std::memcpy(lanes, state, 200);  // little-endian host assumed (x86/arm LE)
  keccak_f1600(lanes);
  std::memcpy(state, lanes, 200);
}

static void run_f(Strobe128* s) {
  s->state[s->pos] ^= s->pos_begin;
  s->state[s->pos + 1] ^= 0x04;
  s->state[kRate + 1] ^= 0x80;
  bb_keccak_f1600(s->state);
  s->pos = 0;
  s->pos_begin = 0;
}

static void absorb(Strobe128* s, const uint8_t* data, size_t n) {
  for (size_t i = 0; i < n; ++i) {
    s->state[s->pos] ^= data[i];
    if (++s->pos == kRate) run_f(s);
  }
}

static void squeeze(Strobe128* s, uint8_t* out, size_t n) {
  for (size_t i = 0; i < n; ++i) {
    out[i] = s->state[s->pos];
    s->state[s->pos] = 0;
    if (++s->pos == kRate) run_f(s);
  }
}

static void overwrite(Strobe128* s, const uint8_t* data, size_t n) {
  for (size_t i = 0; i < n; ++i) {
    s->state[s->pos] = data[i];
    if (++s->pos == kRate) run_f(s);
  }
}

static int begin_op(Strobe128* s, uint8_t flags, int more) {
  if (more) return flags == s->cur_flags ? 0 : -1;
  if (flags & FLAG_T) return -2;  // transport ops unimplemented (as merlin)
  uint8_t old_begin = s->pos_begin;
  s->pos_begin = s->pos + 1;
  s->cur_flags = flags;
  uint8_t hdr[2] = {old_begin, flags};
  absorb(s, hdr, 2);
  if ((flags & (FLAG_C | FLAG_K)) && s->pos != 0) run_f(s);
  return 0;
}

void bb_strobe_init(Strobe128* s, const uint8_t* label, size_t len) {
  std::memset(s, 0, sizeof(*s));
  const uint8_t iv[6] = {1, kRate + 2, 1, 0, 1, 96};
  std::memcpy(s->state, iv, 6);
  std::memcpy(s->state + 6, "STROBEv1.0.2", 12);
  bb_keccak_f1600(s->state);
  // meta_ad(label, more=false)
  begin_op(s, FLAG_M | FLAG_A, 0);
  absorb(s, label, len);
}

int bb_strobe_meta_ad(Strobe128* s, const uint8_t* d, size_t n, int more) {
  int rc = begin_op(s, FLAG_M | FLAG_A, more);
  if (rc) return rc;
  absorb(s, d, n);
  return 0;
}

int bb_strobe_ad(Strobe128* s, const uint8_t* d, size_t n, int more) {
  int rc = begin_op(s, FLAG_A, more);
  if (rc) return rc;
  absorb(s, d, n);
  return 0;
}

int bb_strobe_prf(Strobe128* s, uint8_t* out, size_t n, int more) {
  int rc = begin_op(s, FLAG_I | FLAG_A | FLAG_C, more);
  if (rc) return rc;
  squeeze(s, out, n);
  return 0;
}

int bb_strobe_key(Strobe128* s, const uint8_t* d, size_t n, int more) {
  int rc = begin_op(s, FLAG_A | FLAG_C, more);
  if (rc) return rc;
  overwrite(s, d, n);
  return 0;
}

}  // extern "C"
