// Native F0 tracker: normalized-autocorrelation (NCCF) pitch estimation.
//
// TPU-native replacement for the reference's PyWORLD dio+stonemask C++
// dependency (reference preprocessor/preprocessor.py:181-186; SURVEY.md
// §2.6 #3): host-side, offline, sequential per frame — the one component
// of the framework that genuinely belongs in C++.  The algorithm is the
// exact math of the validated numpy oracle in
// smart_nar_fast_tts_tpu/data/pitch.py (autocorrelation normalized per
// lag, parabolic lag interpolation, NCCF+RMS voicing gate, median
// continuity smoothing), in double precision, multi-threaded over frames.
//
// Build:  g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
//             f0.cc -o libsmartf0.so
// ABI:    smart_f0_estimate(wav, n, sr, hop, floor, ceil, thresh, out,
//                           n_frames) — see data/native_f0.py for the
//                           ctypes binding.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct FrameResult {
  double f0;       // interpolated candidate frequency (Hz)
  double peak;     // winning NCCF value
  double rms;      // frame RMS (for the silence gate)
};

// One frame: mean-removed window, direct NCCF over [0, lag_max],
// argmax over [lag_min, lag_max], parabolic refinement.
FrameResult process_frame(const double* frame, int win, int sr,
                          int lag_min, int lag_max) {
  std::vector<double> x(frame, frame + win);
  double mean = 0.0;
  for (double v : x) mean += v;
  mean /= win;
  for (double& v : x) v -= mean;

  // prefix energies: csum[t] = sum_{u<=t} x_u^2
  std::vector<double> csum(win);
  double acc = 0.0;
  for (int t = 0; t < win; ++t) {
    acc += x[t] * x[t];
    csum[t] = acc;
  }
  const double e_total = csum[win - 1];

  std::vector<double> nccf(lag_max + 1, 0.0);
  for (int k = 0; k <= lag_max; ++k) {
    double ac = 0.0;
    for (int t = 0; t + k < win; ++t) ac += x[t] * x[t + k];
    // energy of the k-shifted segment: e_total - csum[k-1]
    const double e_lag = e_total - (k > 0 ? csum[k - 1] : 0.0);
    const double denom = std::sqrt(std::max(e_total * e_lag, 1e-12));
    nccf[k] = ac / denom;
  }

  int best = lag_min;
  for (int k = lag_min; k <= lag_max; ++k)
    if (nccf[k] > nccf[best]) best = k;
  const double peak = nccf[best];

  // parabolic interpolation at the clamped winning lag (oracle semantics:
  // refine only when the winner is interior)
  const int k_c = std::clamp(best, lag_min + 1, lag_max - 1);
  double lag = static_cast<double>(best);
  if (best == k_c) {
    const double ym = nccf[k_c - 1], y0 = nccf[k_c], yp = nccf[k_c + 1];
    const double d2 = ym - 2.0 * y0 + yp;
    double delta = 0.0;
    if (std::fabs(d2) > 1e-12) delta = 0.5 * (ym - yp) / d2;
    delta = std::clamp(delta, -0.5, 0.5);
    lag = best + delta;
  }

  const double var = e_total / win;  // mean already removed
  return {sr / lag, peak, std::sqrt(var + 1e-12)};
}

}  // namespace

extern "C" {

// wav: n samples (double).  out: n_frames = n / hop + 1 doubles, F0 in Hz
// with 0.0 at unvoiced frames.  Returns 0 on success.
int smart_f0_estimate(const double* wav, int64_t n, int sr, int hop,
                      double f0_floor, double f0_ceil, double nccf_threshold,
                      double* out, int64_t n_frames) {
  if (n <= 0 || n_frames != n / hop + 1) return 1;
  const int lag_min = std::max(2, static_cast<int>(sr / f0_ceil));
  const int lag_max = static_cast<int>(std::ceil(sr / f0_floor));
  int win = 1;
  while (win < 2 * lag_max) win <<= 1;  // 2^ceil(log2(2·lag_max))
  const int half = win / 2;

  // frame layout identical to the oracle: centers at i·hop into a signal
  // padded by (half, half + win)
  std::vector<double> padded(n + half + half + win, 0.0);
  std::memcpy(padded.data() + half, wav, n * sizeof(double));

  std::vector<FrameResult> res(n_frames);
  const int hw = std::max(1u, std::thread::hardware_concurrency());
  const int n_threads =
      static_cast<int>(std::min<int64_t>(hw, n_frames));
  std::vector<std::thread> workers;
  workers.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) {
    workers.emplace_back([&, t] {
      for (int64_t i = t; i < n_frames; i += n_threads)
        res[i] = process_frame(padded.data() + i * hop, win, sr,
                               lag_min, lag_max);
    });
  }
  for (auto& w : workers) w.join();

  double rms_max = 0.0;
  for (const auto& r : res) rms_max = std::max(rms_max, r.rms);

  std::vector<double> f0(n_frames);
  for (int64_t i = 0; i < n_frames; ++i) {
    const auto& r = res[i];
    const bool voiced = r.peak > nccf_threshold && r.f0 >= f0_floor &&
                        r.f0 <= f0_ceil &&
                        r.rms > 0.03 * (rms_max + 1e-12);
    f0[i] = voiced ? r.f0 : 0.0;
  }

  // 3-tap median with edge replication (scipy mode="nearest"), then fill
  // median-voiced gaps and kill single-frame voiced islands — oracle
  // pitch.py:79-83 semantics
  std::vector<double> med(n_frames);
  for (int64_t i = 0; i < n_frames; ++i) {
    double a = f0[std::max<int64_t>(i - 1, 0)];
    double b = f0[i];
    double c = f0[std::min<int64_t>(i + 1, n_frames - 1)];
    med[i] = std::max(std::min(a, b), std::min(std::max(a, b), c));
  }
  std::vector<double> merged(n_frames);
  for (int64_t i = 0; i < n_frames; ++i) {
    if (f0[i] > 0.0 && med[i] > 0.0) merged[i] = f0[i];
    else if (med[i] > 0.0) merged[i] = med[i];
    else merged[i] = 0.0;
  }
  for (int64_t i = 0; i < n_frames; ++i) {
    const double prev = i > 0 ? merged[i - 1] : merged[n_frames - 1];
    const double next =
        i + 1 < n_frames ? merged[i + 1] : merged[0];
    // np.roll wraps at the edges — match it exactly
    out[i] = (merged[i] > 0.0 && prev == 0.0 && next == 0.0) ? 0.0
                                                             : merged[i];
  }
  return 0;
}

}  // extern "C"
