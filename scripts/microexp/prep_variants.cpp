// Phase-cost microbench for the v3 seq serving prep (not shipped).
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <algorithm>
#include <chrono>
#include <vector>

static inline uint64_t splitmix64(uint64_t z) {
  z += 0x9E3779B97F4A7C15ull;
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
  return z ^ (z >> 31);
}
static inline uint64_t base_code(uint8_t b) {
  switch (b) { case 'C': return 1; case 'G': return 2; case 'T': return 3; default: return 0; }
}
static inline uint64_t comp_code(uint8_t b) {
  switch (b) { case 'A': return 3; case 'C': return 2; case 'G': return 1; case 'T': return 0; default: return 0; }
}
struct FastMod {
  uint64_t d, M, mask; bool pow2;
  explicit FastMod(uint64_t dd) : d(dd), M(dd > 1 ? (~0ull)/dd : 0), mask(dd-1), pow2(dd>0 && (dd&(dd-1))==0) {}
  inline uint64_t reduce_small(uint64_t x) const {
    uint64_t q = (uint64_t)(((unsigned __int128)x * M) >> 64);
    uint64_t r2 = x - q * d; if (r2 >= d) r2 -= d; return r2;
  }
  inline uint64_t mod(uint64_t n) const {
    if (pow2) return n & mask;
    const uint64_t hm = reduce_small(n >> 32);
    return reduce_small((hm << 32) | (n & 0xFFFFFFFFull));
  }
};

// variant flags
#ifndef DEDUP
#define DEDUP 1
#endif
#ifndef FASTMOD
#define FASTMOD 1
#endif
#ifndef SLOTS
#define SLOTS 1
#endif
#ifndef WINMIN
#define WINMIN 1
#endif

int64_t prep(const uint8_t* seqs, const int64_t* sstart, int64_t B, int k,
             int s, uint64_t seed, int64_t num_tiles, int h, int tile_rows,
             int r, int64_t K_cap, int32_t* utile, uint32_t* gmask,
             int32_t* n_valid) {
  const int w = k - s + 1;
  const uint64_t kmask = (k == 32) ? ~0ull : ((1ull << (2 * k)) - 1);
  const uint64_t smask_code = (1ull << (2 * s)) - 1;
  const FastMod tilemod((uint64_t)num_tiles);
  const FastMod rowmod((uint64_t)tile_rows);
  uint64_t tsize = 16;
  while (tsize < (uint64_t)(2 * K_cap)) tsize <<= 1;
  const uint64_t tmask = tsize - 1;
  std::vector<uint64_t> seen(tsize);
  uint64_t hw[64];
  int64_t u_max = 0;
  for (int64_t q = 0; q < B; q++) {
    const int64_t p0 = sstart[q], p1 = sstart[q + 1];
    const int64_t len = p1 - p0;
    const int64_t nk = len >= k ? len - k + 1 : 0;
    int32_t* urow = utile + q * K_cap;
    uint32_t* grow = gmask + q * K_cap * r;
    int64_t entry = -1; int32_t cur_tile = -1; int slot = r; int32_t distinct = 0;
#if DEDUP
    if (nk > 0) std::memset(seen.data(), 0, sizeof(uint64_t) * tsize);
#endif
    uint64_t fwd = 0, rc = 0; int head = 0; uint64_t mn = 0; int mn_slot = 0;
    const uint8_t* sq = seqs + p0;
    for (int64_t i = 0; i < nk; i++) {
      if (i == 0) {
        fwd = 0; rc = 0;
        for (int j = 0; j < k; j++) { fwd = (fwd << 2) | base_code(sq[j]); rc |= comp_code(sq[j]) << (2 * j); }
        mn = ~0ull;
        for (int j = 0; j < w; j++) {
          const uint64_t sf = (fwd >> (2 * (k - s - j))) & smask_code;
          const uint64_t sr = (rc >> (2 * j)) & smask_code;
          hw[j] = splitmix64(seed ^ std::min(sf, sr));
          if (hw[j] < mn) { mn = hw[j]; mn_slot = j; }
        }
        head = 0;
      } else {
        const uint8_t b = sq[i + k - 1];
        fwd = ((fwd << 2) | base_code(b)) & kmask;
        rc = (rc >> 2) | (comp_code(b) << (2 * (k - 1)));
        const uint64_t sf = fwd & smask_code;
        const uint64_t sr = (rc >> (2 * (k - s))) & smask_code;
        const uint64_t hv = splitmix64(seed ^ std::min(sf, sr));
#if WINMIN
        const int expired = head;
        hw[head] = hv;
        head = head + 1 == w ? 0 : head + 1;
        if (hv <= mn) { mn = hv; mn_slot = expired; }
        else if (mn_slot == expired) {
          mn = hw[0]; mn_slot = 0;
          for (int j = 1; j < w; j++) if (hw[j] < mn) { mn = hw[j]; mn_slot = j; }
        }
#else
        mn ^= hv;
#endif
      }
#if DEDUP
      const uint64_t key = fwd + 1;
      uint64_t probe = (fwd * 0x9E3779B97F4A7C15ull) >> (64 - 11);  // fib hash
      probe &= tmask;
      bool dup = false;
      for (;;) {
        const uint64_t cur = seen[(size_t)probe];
        if (cur == 0) { seen[(size_t)probe] = key; break; }
        if (cur == key) { dup = true; break; }
        probe = (probe + 1) & tmask;
      }
      if (dup) continue;
#endif
      distinct++;
#if FASTMOD
      const int32_t tile = (int32_t)tilemod.mod(mn);
#else
      const int32_t tile = (int32_t)(mn % (uint64_t)num_tiles);
#endif
      uint32_t sm = 0;
#if SLOTS
      const uint64_t hv2 = splitmix64(std::min(fwd, rc));
#if FASTMOD
      for (int j = 0; j < h; j++) sm |= 1u << (uint32_t)rowmod.mod((uint32_t)(hv2 >> (6 * j)));
#else
      for (int j = 0; j < h; j++) sm |= 1u << ((uint32_t)(hv2 >> (6 * j)) % (uint32_t)tile_rows);
#endif
#else
      sm = (uint32_t)fwd | 1;
#endif
      if (entry < 0 || tile != cur_tile || slot == r) { entry++; cur_tile = tile; urow[entry] = tile; slot = 0; }
      grow[entry * r + slot] = sm; slot++;
    }
    n_valid[q] = distinct;
    u_max = std::max(u_max, entry + 1);
  }
  return u_max;
}

int main(int argc, char** argv) {
  const int64_t B = 256; const int k = 31, s = 13, h = 3, tr = 16, r = 20;
  const int64_t T = 25000000 / tr;
  const int64_t L = 512 + k - 1;
  std::vector<uint8_t> seqs((size_t)(B * L));
  std::vector<int64_t> sstart((size_t)B + 1);
  uint64_t st = 12345;
  const char* bases = "ACGT";
  for (int64_t i = 0; i < B * L; i++) { st = splitmix64(st); seqs[(size_t)i] = (uint8_t)bases[st & 3]; }
  for (int64_t i = 0; i <= B; i++) sstart[(size_t)i] = i * L;
  const int64_t K_cap = L - k + 1;
  std::vector<int32_t> utile((size_t)(B * K_cap));
  std::vector<uint32_t> gmask((size_t)(B * K_cap * r));
  std::vector<int32_t> n_valid((size_t)B);
  double best = 1e9; int64_t um = 0;
  for (int rep = 0; rep < 12; rep++) {
    std::memset(utile.data(), 0, utile.size() * 4);
    std::memset(gmask.data(), 0, gmask.size() * 4);
    auto t0 = std::chrono::steady_clock::now();
    um = prep(seqs.data(), sstart.data(), B, k, s, 0x5EEDull, T, h, tr, r, K_cap, utile.data(), gmask.data(), n_valid.data());
    auto t1 = std::chrono::steady_clock::now();
    best = std::min(best, std::chrono::duration<double, std::milli>(t1 - t0).count());
  }
  printf("DEDUP=%d FASTMOD=%d SLOTS=%d WINMIN=%d : %.3f ms/batch (%.1f ns/kmer) u_max=%ld nv0=%d\n",
         DEDUP, FASTMOD, SLOTS, WINMIN, best, best * 1e6 / (double)(B * 512), (long)um, n_valid[0]);
  return 0;
}
