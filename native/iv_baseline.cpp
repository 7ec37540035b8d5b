// Measured CPU baseline for bench.py stages B and C: the reference's
// scalar Baum-Welch stats loop and exact i-vector extraction.
//
// Stage B re-implements the arithmetic of computeAndAccumulateTVStat
// (LIA_SpkTools/src/AccumulateTVStat.cpp:281-351: occupancy posteriors ×
// frames into _statN/_statF — the EM loop minus the second-order sums).
// Stage C re-implements estimateW (AccumulateTVStat.cpp:2103-2267):
// _TETt precompute (E_k = T_k Σ_k⁻¹ T_kᵀ, cpp:766), per-utterance
// L = I + Σ_k n_k E_k, Cholesky factorisation and solve for w.
// Compiled -O3 -ffast-math -march=native like the reference
// (configure.ac:21); deliberately the reference's scalar/loop structure,
// not a BLAS reformulation, so the number stands in for "LIA_RAL on a
// CPU core".
//
// Usage: iv_baseline [K D R N_FRAMES T_UTT THREADS ITERS]
// Prints one JSON line with bw/iv frames-per-second rates.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <chrono>
#include <thread>
#include <vector>

namespace {

struct Rng {
  uint64_t s;
  explicit Rng(uint64_t seed) : s(seed ? seed : 0x9e3779b97f4a7c15ull) {}
  uint64_t next() { s ^= s << 13; s ^= s >> 7; s ^= s << 17; return s; }
  double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
  double normal() {
    double u1 = uniform() + 1e-12, u2 = uniform();
    return std::sqrt(-2.0 * std::log(u1)) * std::cos(6.283185307179586 * u2);
  }
};

// ---- stage B: per-utterance (N, F) stats -----------------------------------
void bw_worker(const float *x, long n0, long n1, int K, int D,
               const double *w, const double *mu, const double *ci,
               const double *cst, double *nacc, double *facc) {
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
    double inv = 1.0 / total;
    for (int k = 0; k < K; k++) {
      double p = lk[k] * inv;
      nacc[k] += p;
      double *fk = facc + (size_t)k * D;
      for (int d = 0; d < D; d++) fk[d] += p * f[d];
    }
  }
}

// ---- stage C: exact i-vector solve per utterance ---------------------------
// L = I + Σ_k n_k E_k;  chol(L);  w = L⁻¹ (T Σ⁻¹ F̄)
void iv_worker(long u0, long u1, int K, int R,
               const double *E,       // (K, R, R) packed full
               const double *nmat,    // (U, K)
               const double *aux,     // (U, R) T Σ⁻¹ F̄, precomputed
               double *wout) {        // (U, R)
  std::vector<double> L((size_t)R * R), y(R);
  for (long u = u0; u < u1; u++) {
    const double *nu = nmat + (size_t)u * K;
    for (int i = 0; i < R; i++)
      for (int j = 0; j <= i; j++)
        L[(size_t)i * R + j] = (i == j) ? 1.0 : 0.0;
    for (int k = 0; k < K; k++) {
      double nk = nu[k];
      const double *Ek = E + (size_t)k * R * R;
      for (int i = 0; i < R; i++) {
        const double *Ei = Ek + (size_t)i * R;
        double *Li = &L[(size_t)i * R];
        for (int j = 0; j <= i; j++) Li[j] += nk * Ei[j];
      }
    }
    // in-place Cholesky (lower)
    for (int i = 0; i < R; i++) {
      double *Li = &L[(size_t)i * R];
      for (int j = 0; j < i; j++) {
        const double *Lj = &L[(size_t)j * R];
        double s = Li[j];
        for (int t = 0; t < j; t++) s -= Li[t] * Lj[t];
        Li[j] = s / Lj[j];
      }
      double s = Li[i];
      for (int t = 0; t < i; t++) s -= Li[t] * Li[t];
      Li[i] = std::sqrt(s > 1e-12 ? s : 1e-12);
    }
    // forward/backward solve
    const double *au = aux + (size_t)u * R;
    for (int i = 0; i < R; i++) {
      double s = au[i];
      const double *Li = &L[(size_t)i * R];
      for (int t = 0; t < i; t++) s -= Li[t] * y[t];
      y[i] = s / Li[i];
    }
    double *wu = wout + (size_t)u * R;
    for (int i = R - 1; i >= 0; i--) {
      double s = y[i];
      for (int t = i + 1; t < R; t++) s -= L[(size_t)t * R + i] * wu[t];
      wu[i] = s / L[(size_t)i * R + i];
    }
  }
}

}  // namespace

int main(int argc, char **argv) {
  int K = argc > 1 ? atoi(argv[1]) : 2048;
  int D = argc > 2 ? atoi(argv[2]) : 39;
  int R = argc > 3 ? atoi(argv[3]) : 400;
  long N = argc > 4 ? atol(argv[4]) : 100000;
  long T_UTT = argc > 5 ? atol(argv[5]) : 2000;
  int threads = argc > 6 ? atoi(argv[6]) : 1;
  int iters = argc > 7 ? atoi(argv[7]) : 2;

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

  // ---- stage B timing ------------------------------------------------------
  double best_bw = 1e30;
  {
    std::vector<double> nacc((size_t)K * threads),
        facc((size_t)K * D * threads);
    bw_worker(x.data(), 0, N > 2000 ? 2000 : N, K, D, w.data(), mu.data(),
              ci.data(), cst.data(), nacc.data(), facc.data());  // warm-up
    for (int it = 0; it < iters; it++) {
      std::fill(nacc.begin(), nacc.end(), 0.0);
      std::fill(facc.begin(), facc.end(), 0.0);
      auto t0 = std::chrono::steady_clock::now();
      std::vector<std::thread> pool;
      long per = (N + threads - 1) / threads;
      for (int t = 0; t < threads; t++) {
        long a = t * per, b = a + per > N ? N : a + per;
        pool.emplace_back(bw_worker, x.data(), a, b, K, D, w.data(),
                          mu.data(), ci.data(), cst.data(),
                          &nacc[(size_t)K * t], &facc[(size_t)K * D * t]);
      }
      for (auto &th : pool) th.join();
      auto t1 = std::chrono::steady_clock::now();
      double dt = std::chrono::duration<double>(t1 - t0).count();
      if (dt < best_bw) best_bw = dt;
    }
  }

  // ---- stage C timing ------------------------------------------------------
  long U = N / T_UTT;
  if (U < 1) U = 1;
  // E_k precompute from a random T (R, K, D) — _TETt, cpp:766
  std::vector<double> E((size_t)K * R * R);
  {
    std::vector<double> T((size_t)R * K * D);
    for (auto &v : T) v = rng.normal() * 0.01;
    for (int k = 0; k < K; k++) {
      double *Ek = &E[(size_t)k * R * R];
      const double *ck = &ci[(size_t)k * D];
      for (int i = 0; i < R; i++) {
        const double *Ti = &T[((size_t)i * K + k) * D];
        for (int j = 0; j <= i; j++) {
          const double *Tj = &T[((size_t)j * K + k) * D];
          double s = 0.0;
          for (int d = 0; d < D; d++) s += Ti[d] * ck[d] * Tj[d];
          Ek[(size_t)i * R + j] = s;
          Ek[(size_t)j * R + i] = s;
        }
      }
    }
  }
  std::vector<double> nmat((size_t)U * K), aux((size_t)U * R),
      wout((size_t)U * R);
  for (auto &v : nmat) v = rng.uniform() * (double)T_UTT / K;
  for (auto &v : aux) v = rng.normal();
  double best_iv = 1e30;
  iv_worker(0, U > 2 ? 2 : U, K, R, E.data(), nmat.data(), aux.data(),
            wout.data());  // warm-up
  for (int it = 0; it < iters; it++) {
    auto t0 = std::chrono::steady_clock::now();
    std::vector<std::thread> pool;
    long per = (U + threads - 1) / threads;
    for (int t = 0; t < threads; t++) {
      long a = t * per, b = a + per > U ? U : a + per;
      pool.emplace_back(iv_worker, a, b, K, R, E.data(), nmat.data(),
                        aux.data(), wout.data());
    }
    for (auto &th : pool) th.join();
    auto t1 = std::chrono::steady_clock::now();
    double dt = std::chrono::duration<double>(t1 - t0).count();
    if (dt < best_iv) best_iv = dt;
  }

  double bw_fps = N / best_bw;
  double iv_utt_per_s = U / best_iv;
  double iv_fps = iv_utt_per_s * T_UTT;   // frames "covered" per second
  printf("{\"K\":%d,\"D\":%d,\"R\":%d,\"n_frames\":%ld,\"t_utt\":%ld,"
         "\"threads\":%d,\"bw_frames_per_s\":%.1f,"
         "\"bw_audio_s_per_s\":%.2f,\"iv_utt_per_s\":%.3f,"
         "\"iv_audio_s_per_s\":%.2f}\n",
         K, D, R, N, T_UTT, threads, bw_fps, bw_fps / 100.0, iv_utt_per_s,
         iv_fps / 100.0);
  return 0;
}
