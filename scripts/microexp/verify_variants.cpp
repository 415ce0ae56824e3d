// Host-verify kernel variants: is and_count_words_batch leaving
// memory-level parallelism on the table?  Baseline = the production
// kernel (PD=8 lookahead, compute interleaved).  Variants: deeper
// prefetch, and a two-phase gather-then-count split whose gather loop
// has no compute between misses.
// Build+run:
//   g++ -O3 -std=c++17 -march=native -pthread -o /tmp/vv \
//       scripts/microexp/verify_variants.cpp && /tmp/vv
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <random>
#include <thread>
#include <vector>

static const int64_t M = 25'000'000, W = 32;
static const int64_t B = 256, K = 512;
static const int H = 3, NW = 8;

template <int PD>
static void kernel_baseline(const uint32_t* mat, const int64_t* idx,
                            const int32_t* wids, int64_t* out) {
  for (int64_t i = 0; i < K; i++) {
    if (i + PD < K) {
      const int64_t* prows = idx + (i + PD) * H;
      for (int t = 0; t < H; t++) {
        const uint32_t* base = mat + prows[t] * W;
        for (int64_t j = 0; j < NW; j++)
          __builtin_prefetch(base + wids[j], 0, 1);
      }
    }
    const int64_t* rows = idx + i * H;
    for (int64_t j = 0; j < NW; j++) {
      const int64_t col = (int64_t)wids[j];
      uint32_t acc = mat[rows[0] * W + col];
      for (int t = 1; t < H; t++) acc &= mat[rows[t] * W + col];
      int64_t* o = out + j * 32;
      while (acc) { int b = __builtin_ctz(acc); o[b]++; acc &= acc - 1; }
    }
  }
}

// two-phase: gather all needed words into a scratch buffer with a pure
// prefetch-ahead load loop, then count from L2-resident scratch
template <int PD>
static void kernel_twophase(const uint32_t* mat, const int64_t* idx,
                            const int32_t* wids, int64_t* out,
                            uint32_t* scratch) {
  const int64_t n = K * H;
  for (int64_t i = 0; i < n; i++) {
    if (i + PD < n) __builtin_prefetch(mat + idx[i + PD] * W, 0, 1);
    if (i + PD < n) __builtin_prefetch(mat + idx[i + PD] * W + W - 1, 0, 1);
    const uint32_t* base = mat + idx[i] * W;
    uint32_t* dst = scratch + i * NW;
    for (int64_t j = 0; j < NW; j++) dst[j] = base[wids[j]];
  }
  for (int64_t i = 0; i < K; i++) {
    const uint32_t* r0 = scratch + (i * H + 0) * NW;
    const uint32_t* r1 = scratch + (i * H + 1) * NW;
    const uint32_t* r2 = scratch + (i * H + 2) * NW;
    for (int64_t j = 0; j < NW; j++) {
      uint32_t acc = r0[j] & r1[j] & r2[j];
      int64_t* o = out + j * 32;
      while (acc) { int b = __builtin_ctz(acc); o[b]++; acc &= acc - 1; }
    }
  }
}

typedef void (*fn_t)(const uint32_t*, const int64_t*, const int32_t*,
                     int64_t*, uint32_t*);

static double run(const char* name, fn_t fn, const uint32_t* mat,
                  const std::vector<int64_t>& idx,
                  const std::vector<int32_t>& wids) {
  std::vector<int64_t> out(B * NW * 32, 0);
  double best = 1e9;
  for (int rep = 0; rep < 5; rep++) {
    auto t0 = std::chrono::steady_clock::now();
    std::vector<std::thread> th;
    for (int t = 0; t < 2; t++) {
      th.emplace_back([&, t] {
        std::vector<uint32_t> scratch(K * H * NW);
        for (int64_t q = t * B / 2; q < (t + 1) * B / 2; q++)
          fn(mat, idx.data() + q * K * H, wids.data() + q * NW,
             out.data() + q * NW * 32, scratch.data());
      });
    }
    for (auto& x : th) x.join();
    double ms = std::chrono::duration<double, std::milli>(
                    std::chrono::steady_clock::now() - t0).count();
    if (ms < best) best = ms;
  }
  printf("%-28s %7.2f ms/batch\n", name, best);
  return best;
}

template <int PD>
static void base_wrap(const uint32_t* m, const int64_t* i,
                      const int32_t* w, int64_t* o, uint32_t*) {
  kernel_baseline<PD>(m, i, w, o);
}

int main() {
  std::mt19937_64 rng(1);
  std::vector<uint32_t> mat(M * W);
  for (auto& x : mat) x = (uint32_t)rng();
  std::vector<int64_t> idx(B * K * H);
  for (auto& x : idx) x = (int64_t)(rng() % M);
  std::vector<int32_t> wids(B * NW);
  for (int64_t q = 0; q < B; q++) {
    for (int j = 0; j < NW; j++) wids[q * NW + j] = (int32_t)(rng() % W);
  }
  run("baseline PD=8 (production)", base_wrap<8>, mat.data(), idx, wids);
  run("baseline PD=16", base_wrap<16>, mat.data(), idx, wids);
  run("baseline PD=32", base_wrap<32>, mat.data(), idx, wids);
  run("twophase PD=16", kernel_twophase<16>, mat.data(), idx, wids);
  run("twophase PD=32", kernel_twophase<32>, mat.data(), idx, wids);
  run("twophase PD=64", kernel_twophase<64>, mat.data(), idx, wids);
  return 0;
}

// ROUND-5 PRODUCTION A/B NOTE: the two-phase win above holds only for
// the TEMPLATED variant (compile-time NW/H).  A generic runtime-nw
// rewrite of and_count_words measured at parity-to-worse in the
// production harness (alternating A/B: new 14.2/17.1/11.5 vs old
// 11.0/11.4/15.0 ms/batch — within this host's noise but never
// clearly ahead), so the interleaved PD=8 kernel stays.
