/* Portable BLAKE3 (hash + XOF) for single-chunk inputs (<= 1024 bytes).
 *
 * Native host component: Pedersen base derivation hashes degree+2 points,
 * each from a ~50-byte seed (reference: src/hash_to_curve.rs:13-76,
 * circuit_builder.rs:1127-1129); at 2^20 bases the pure-python XOF
 * dominates setup time.  Built on demand by plonky_tpu/hashing/blake3.py
 * via ctypes (no pybind11 in this image); inputs larger than one chunk
 * return -1 and the caller falls back to the python implementation.
 *
 * Implementation follows the public BLAKE3 specification (IV/permutation
 * constants, 7-round compression, root XOF).
 */

#include <stddef.h>
#include <stdint.h>
#include <string.h>

#define BLOCK_LEN 64u
#define CHUNK_LEN 1024u

#define CHUNK_START (1u << 0)
#define CHUNK_END (1u << 1)
#define ROOT (1u << 3)

static const uint32_t IV[8] = {
    0x6A09E667u, 0xBB67AE85u, 0x3C6EF372u, 0xA54FF53Au,
    0x510E527Fu, 0x9B05688Cu, 0x1F83D9ABu, 0x5BE0CD19u,
};

static const uint8_t MSG_PERM[16] = {2, 6,  3, 10, 7, 0,  4, 13,
                                     1, 11, 12, 5, 9, 14, 15, 8};

static inline uint32_t rotr32(uint32_t x, int n) {
  return (x >> n) | (x << (32 - n));
}

static inline void g(uint32_t *s, int a, int b, int c, int d, uint32_t mx,
                     uint32_t my) {
  s[a] = s[a] + s[b] + mx;
  s[d] = rotr32(s[d] ^ s[a], 16);
  s[c] = s[c] + s[d];
  s[b] = rotr32(s[b] ^ s[c], 12);
  s[a] = s[a] + s[b] + my;
  s[d] = rotr32(s[d] ^ s[a], 8);
  s[c] = s[c] + s[d];
  s[b] = rotr32(s[b] ^ s[c], 7);
}

static void round_fn(uint32_t *s, const uint32_t *m) {
  g(s, 0, 4, 8, 12, m[0], m[1]);
  g(s, 1, 5, 9, 13, m[2], m[3]);
  g(s, 2, 6, 10, 14, m[4], m[5]);
  g(s, 3, 7, 11, 15, m[6], m[7]);
  g(s, 0, 5, 10, 15, m[8], m[9]);
  g(s, 1, 6, 11, 12, m[10], m[11]);
  g(s, 2, 7, 8, 13, m[12], m[13]);
  g(s, 3, 4, 9, 14, m[14], m[15]);
}

static void compress(const uint32_t cv[8], const uint32_t block[16],
                     uint64_t counter, uint32_t block_len, uint32_t flags,
                     uint32_t out[16]) {
  uint32_t state[16];
  uint32_t m[16], perm[16];
  int r, i;
  memcpy(state, cv, 8 * sizeof(uint32_t));
  memcpy(state + 8, IV, 4 * sizeof(uint32_t));
  state[12] = (uint32_t)counter;
  state[13] = (uint32_t)(counter >> 32);
  state[14] = block_len;
  state[15] = flags;
  memcpy(m, block, sizeof(m));
  for (r = 0; r < 7; r++) {
    round_fn(state, m);
    if (r != 6) {
      for (i = 0; i < 16; i++) perm[i] = m[MSG_PERM[i]];
      memcpy(m, perm, sizeof(m));
    }
  }
  for (i = 0; i < 8; i++) {
    out[i] = state[i] ^ state[i + 8];
    out[i + 8] = state[i + 8] ^ cv[i];
  }
}

static void words_from_block(const uint8_t *block, size_t len,
                             uint32_t words[16]) {
  uint8_t padded[BLOCK_LEN];
  int i;
  memset(padded, 0, sizeof(padded));
  memcpy(padded, block, len);
  for (i = 0; i < 16; i++) {
    words[i] = (uint32_t)padded[4 * i] | ((uint32_t)padded[4 * i + 1] << 8) |
               ((uint32_t)padded[4 * i + 2] << 16) |
               ((uint32_t)padded[4 * i + 3] << 24);
  }
}

int blake3_hash_xof(const uint8_t *data, size_t len, uint8_t *out,
                    size_t out_len) {
  uint32_t cv[8];
  uint32_t root_block[16];
  uint32_t root_cv[8];
  uint32_t root_block_len, root_flags;
  size_t n_blocks, i, blen, produced;
  uint64_t block_counter;

  if (len > CHUNK_LEN) return -1; /* multi-chunk: python fallback */

  memcpy(cv, IV, sizeof(cv));
  n_blocks = len == 0 ? 1 : (len + BLOCK_LEN - 1) / BLOCK_LEN;
  for (i = 0; i + 1 < n_blocks; i++) {
    uint32_t words[16], full[16];
    uint32_t flags = (i == 0) ? CHUNK_START : 0;
    words_from_block(data + i * BLOCK_LEN, BLOCK_LEN, words);
    compress(cv, words, 0, BLOCK_LEN, flags, full);
    memcpy(cv, full, 8 * sizeof(uint32_t));
  }
  blen = len - (n_blocks - 1) * BLOCK_LEN;
  words_from_block(data + (n_blocks - 1) * BLOCK_LEN, blen, root_block);
  memcpy(root_cv, cv, sizeof(cv));
  root_block_len = (uint32_t)blen;
  root_flags = CHUNK_END | (n_blocks == 1 ? CHUNK_START : 0);

  produced = 0;
  block_counter = 0;
  while (produced < out_len) {
    uint32_t words[16];
    uint8_t block_bytes[64];
    size_t take;
    compress(root_cv, root_block, block_counter, root_block_len,
             root_flags | ROOT, words);
    for (i = 0; i < 16; i++) {
      block_bytes[4 * i] = (uint8_t)(words[i]);
      block_bytes[4 * i + 1] = (uint8_t)(words[i] >> 8);
      block_bytes[4 * i + 2] = (uint8_t)(words[i] >> 16);
      block_bytes[4 * i + 3] = (uint8_t)(words[i] >> 24);
    }
    take = out_len - produced < 64 ? out_len - produced : 64;
    memcpy(out + produced, block_bytes, take);
    produced += take;
    block_counter++;
  }
  return 0;
}
