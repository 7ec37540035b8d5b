// Measured CPU baseline for bench.py: the reference's scalar EM hot loop.
//
// Re-implements the per-frame/per-component arithmetic the reference
// executes in ALIZE MixtureGDStat::computeAndAccumulateEM, driven by
// LIA_SpkTools/src/AccumulateStat.cpp:103-152 (accumulateStatEM) and
// its pthread variant (cpp:234-299: per-thread accumulators merged with
// addAccEM):
//   per frame:  lk_i = cst_i * exp(-0.5 * sum_d (x_d-mu_id)^2 * covInv_id)
//               total = sum_i w_i * lk_i      (llk += log(total))
//               p_i   = w_i * lk_i / total
//               occ_i += p_i;  sumx_i += p_i*x;  sumxx_i += p_i*x^2
// Compiled -O3 -ffast-math -march=native like the reference
// (configure.ac:21).  This is a deliberately faithful SCALAR formulation
// (one exp per component per frame, component-major loop) — the
// reference's algorithm, not a BLAS reformulation — because the number
// it produces stands in for "LIA_RAL on a CPU core".
//
// Usage: em_baseline [K D N_FRAMES THREADS ITERS]
// Prints one JSON line: {"frames_per_s":..., "audio_s_per_s":..., ...}

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <chrono>
#include <thread>
#include <vector>

namespace {

// deterministic xorshift data generator (no libc rand dependence)
struct Rng {
  uint64_t s;
  explicit Rng(uint64_t seed) : s(seed ? seed : 0x9e3779b97f4a7c15ull) {}
  uint64_t next() {
    s ^= s << 13; s ^= s >> 7; s ^= s << 17; return s;
  }
  double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
  double normal() {  // Box-Muller, matching the reference's taste for it
    double u1 = uniform() + 1e-12, u2 = uniform();
    return std::sqrt(-2.0 * std::log(u1)) * std::cos(6.283185307179586 * u2);
  }
};

struct Acc {
  std::vector<double> occ, sumx, sumxx;
  double llk = 0.0;
  Acc(int K, int D) : occ(K, 0.0), sumx((size_t)K * D, 0.0),
                      sumxx((size_t)K * D, 0.0) {}
  void merge(const Acc &o) {   // the reference's addAccEM
    for (size_t i = 0; i < occ.size(); i++) occ[i] += o.occ[i];
    for (size_t i = 0; i < sumx.size(); i++) sumx[i] += o.sumx[i];
    for (size_t i = 0; i < sumxx.size(); i++) sumxx[i] += o.sumxx[i];
    llk += o.llk;
  }
};

void em_worker(const float *x, long n0, long n1, int K, int D,
               const double *w, const double *mu, const double *ci,
               const double *cst, Acc *acc) {
  std::vector<double> lk(K);
  for (long n = n0; n < n1; n++) {
    const float *f = x + (size_t)n * D;
    double total = 0.0;
    for (int k = 0; k < K; k++) {
      const double *m = mu + (size_t)k * D;
      const double *c = ci + (size_t)k * D;
      double e = 0.0;
      for (int d = 0; d < D; d++) {
        double t = f[d] - m[d];
        e += t * t * c[d];
      }
      double v = w[k] * cst[k] * std::exp(-0.5 * e);
      lk[k] = v;
      total += v;
    }
    acc->llk += std::log(total);
    double inv = 1.0 / total;
    for (int k = 0; k < K; k++) {
      double p = lk[k] * inv;
      acc->occ[k] += p;
      double *sx = &acc->sumx[(size_t)k * D];
      double *sxx = &acc->sumxx[(size_t)k * D];
      for (int d = 0; d < D; d++) {
        double xd = f[d];
        sx[d] += p * xd;
        sxx[d] += p * xd * xd;
      }
    }
  }
}

}  // namespace

int main(int argc, char **argv) {
  int K = argc > 1 ? atoi(argv[1]) : 2048;
  int D = argc > 2 ? atoi(argv[2]) : 39;
  long N = argc > 3 ? atol(argv[3]) : 100000;
  int threads = argc > 4 ? atoi(argv[4]) : 1;
  int iters = argc > 5 ? atoi(argv[5]) : 3;

  Rng rng(7);
  std::vector<float> x((size_t)N * D);
  for (auto &v : x) v = (float)rng.normal();
  std::vector<double> w(K, 1.0 / K), mu((size_t)K * D), ci((size_t)K * D),
      cst(K);
  const double log2pi = std::log(2.0 * M_PI);
  for (auto &v : mu) v = rng.normal();
  for (auto &v : ci) v = 0.5 + rng.uniform();
  for (int k = 0; k < K; k++) {
    double ld = 0.0;
    for (int d = 0; d < D; d++) ld -= std::log(ci[(size_t)k * D + d]);
    cst[k] = std::exp(-0.5 * (D * log2pi + ld));
  }

  // warm-up pass (page in data, settle turbo)
  {
    Acc a(K, D);
    em_worker(x.data(), 0, N > 2000 ? 2000 : N, K, D, w.data(), mu.data(),
              ci.data(), cst.data(), &a);
  }

  double best_dt = 1e30;
  double llk = 0.0;
  for (int it = 0; it < iters; it++) {
    std::vector<Acc> accs(threads, Acc(K, D));
    auto t0 = std::chrono::steady_clock::now();
    std::vector<std::thread> pool;
    long per = (N + threads - 1) / threads;
    for (int t = 0; t < threads; t++) {
      long a = t * per, b = a + per > N ? N : a + per;
      pool.emplace_back(em_worker, x.data(), a, b, K, D, w.data(), mu.data(),
                        ci.data(), cst.data(), &accs[t]);
    }
    for (auto &th : pool) th.join();
    for (int t = 1; t < threads; t++) accs[0].merge(accs[t]);
    auto t1 = std::chrono::steady_clock::now();
    double dt = std::chrono::duration<double>(t1 - t0).count();
    if (dt < best_dt) best_dt = dt;
    llk = accs[0].llk / N;
  }
  double fps = N / best_dt;
  printf("{\"K\":%d,\"D\":%d,\"n_frames\":%ld,\"threads\":%d,"
         "\"frames_per_s\":%.1f,\"audio_s_per_s\":%.2f,"
         "\"mean_llk\":%.6f}\n",
         K, D, N, threads, fps, fps / 100.0, llk);
  return 0;
}
