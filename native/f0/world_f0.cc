// DIO + StoneMask F0 estimation — C++ mirror of the numpy oracle in
// smart_nar_fast_tts_tpu/data/world_f0.py (see that module's docstring for
// the algorithm description and citations).  This is the framework's
// native replacement for the reference's PyWORLD binary dependency
// (reference preprocessor/preprocessor.py:181-186): host-side, offline,
// double precision, multi-threaded over filter bands (DIO) and frames
// (StoneMask).
//
// Build (together with f0.cc):
//   g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
//       f0.cc world_f0.cc -o libsmartf0.so
// ABI: smart_world_f0(wav, n, sr, hop, floor, ceil, channels_in_octave,
//                     allowed_range, out, n_frames) -> 0 on success.

#include <algorithm>
#include <cmath>
#include <complex>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr double kEps = 1e-12;
constexpr double kPi = 3.14159265358979323846;
using cd = std::complex<double>;

// ---------------------------------------------------------------------
// Radix-2 iterative FFT (sizes are always powers of two here)
// ---------------------------------------------------------------------
void fft_inplace(std::vector<cd>& a, bool inverse) {
  const size_t n = a.size();
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    const double ang = 2.0 * kPi / len * (inverse ? 1.0 : -1.0);
    const cd wl(std::cos(ang), std::sin(ang));
    for (size_t i = 0; i < n; i += len) {
      cd w(1.0);
      for (size_t j = 0; j < len / 2; ++j) {
        cd u = a[i + j];
        cd v = a[i + j + len / 2] * w;
        a[i + j] = u + v;
        a[i + j + len / 2] = u - v;
        w *= wl;
      }
    }
  }
  if (inverse)
    for (auto& x : a) x /= static_cast<double>(n);
}

// rfft of a real signal zero-padded to nfft; returns full complex spectrum
std::vector<cd> rfft(const double* x, size_t n, size_t nfft) {
  std::vector<cd> a(nfft, cd(0.0));
  for (size_t i = 0; i < std::min(n, nfft); ++i) a[i] = cd(x[i], 0.0);
  fft_inplace(a, false);
  return a;
}

std::vector<double> irfft_real(std::vector<cd> spec) {
  fft_inplace(spec, true);
  std::vector<double> out(spec.size());
  for (size_t i = 0; i < spec.size(); ++i) out[i] = spec[i].real();
  return out;
}

size_t next_pow2(size_t n) {
  size_t p = 1;
  while (p < n) p <<= 1;
  return p;
}

// ---------------------------------------------------------------------
// DIO building blocks (numpy oracle: world_f0.py)
// ---------------------------------------------------------------------
std::vector<double> low_cut(const double* wav, size_t n, int fs,
                            double cutoff = 50.0) {
  const size_t nfft = next_pow2(std::max<size_t>(n, 2));
  auto spec = rfft(wav, n, nfft);
  const double lo = 0.5 * cutoff, hi = 1.5 * cutoff;
  for (size_t k = 0; k < nfft; ++k) {
    // frequency of bin k (mirror gain for the conjugate half)
    const double f = (k <= nfft / 2)
        ? static_cast<double>(k) * fs / nfft
        : static_cast<double>(nfft - k) * fs / nfft;
    const double ramp = std::clamp((f - lo) / (hi - lo), 0.0, 1.0);
    spec[k] *= 0.5 - 0.5 * std::cos(kPi * ramp);
  }
  auto full = irfft_real(std::move(spec));
  full.resize(n);
  return full;
}

std::vector<double> nuttall(int n) {
  std::vector<double> w(n);
  for (int i = 0; i < n; ++i) {
    const double t = i * (2.0 * kPi / (n - 1));
    w[i] = 0.355768 - 0.487396 * std::cos(t) + 0.144232 * std::cos(2 * t)
         - 0.012604 * std::cos(3 * t);
  }
  return w;
}

std::vector<double> band_filter(const std::vector<double>& x, int fs,
                                double boundary_f0) {
  const int half = static_cast<int>(
      std::round(fs / boundary_f0 / 2.0 + 0.5));
  const int flen = half * 4;
  auto fir = nuttall(flen);
  double s = 0.0;
  for (double v : fir) s += v;
  for (double& v : fir) v /= s;

  // direct linear convolution, group delay compensated — numerically the
  // oracle's zero-padded FFT convolution (same linear-convolution values,
  // FP rounding aside) but faster than a radix-2 FFT at these sizes, and
  // it threads perfectly across bands
  const int64_t n = static_cast<int64_t>(x.size());
  const int delay = flen / 2;
  std::vector<double> y(n, 0.0);
  for (int64_t i = 0; i < n; ++i) {
    // y_full[i + delay] = sum_k fir[k] * x[i + delay - k]
    const int64_t center = i + delay;
    const int64_t k_lo = std::max<int64_t>(0, center - (n - 1));
    const int64_t k_hi = std::min<int64_t>(flen - 1, center);
    double acc = 0.0;
    const double* xs = x.data() + center;
    for (int64_t k = k_lo; k <= k_hi; ++k) acc += fir[k] * xs[-k];
    y[i] = acc;
  }
  return y;
}

struct Events {
  std::vector<double> mid;  // interval midpoint times (s)
  std::vector<double> f0;   // 1 / interval
};

Events zero_crossings(const double* y, size_t n, int fs, bool negative) {
  std::vector<double> times;
  for (size_t i = 0; i + 1 < n; ++i) {
    const bool hit = negative ? (y[i] > 0.0 && y[i + 1] <= 0.0)
                              : (y[i] < 0.0 && y[i + 1] >= 0.0);
    if (hit) {
      const double frac = y[i] / (y[i] - y[i + 1] + kEps);
      times.push_back((static_cast<double>(i) + frac) / fs);
    }
  }
  Events e;
  if (times.size() < 3) return e;
  e.mid.resize(times.size() - 1);
  e.f0.resize(times.size() - 1);
  for (size_t j = 0; j + 1 < times.size(); ++j) {
    const double dt = std::max(times[j + 1] - times[j], kEps);
    e.f0[j] = 1.0 / dt;
    e.mid[j] = 0.5 * (times[j] + times[j + 1]);
  }
  return e;
}

// np.interp with out-of-span frames zeroed (oracle semantics)
void interp_events(const Events& e, const std::vector<double>& t_frames,
                   double* out) {
  const size_t F = t_frames.size();
  if (e.mid.empty()) {
    std::fill(out, out + F, 0.0);
    return;
  }
  size_t j = 0;
  for (size_t i = 0; i < F; ++i) {
    const double t = t_frames[i];
    if (t < e.mid.front() || t > e.mid.back()) {
      out[i] = 0.0;
      continue;
    }
    while (j + 1 < e.mid.size() && e.mid[j + 1] < t) ++j;
    if (t <= e.mid[j]) {
      out[i] = e.f0[j];
    } else {
      const double w = (t - e.mid[j]) / (e.mid[j + 1] - e.mid[j]);
      out[i] = e.f0[j] + w * (e.f0[j + 1] - e.f0[j]);
    }
  }
}

// one band: candidate + score per frame
void band_candidates(const std::vector<double>& x, int fs,
                     const std::vector<double>& t_frames, double boundary,
                     double f0_floor, double f0_ceil,
                     double* cand, double* score) {
  const auto y = band_filter(x, fs, boundary);
  const size_t n = y.size(), F = t_frames.size();
  std::vector<double> dy(n > 1 ? n - 1 : 0);
  for (size_t i = 0; i + 1 < n; ++i) dy[i] = y[i + 1] - y[i];

  std::vector<std::vector<double>> est(4, std::vector<double>(F));
  interp_events(zero_crossings(y.data(), n, fs, true), t_frames,
                est[0].data());
  interp_events(zero_crossings(y.data(), n, fs, false), t_frames,
                est[1].data());
  interp_events(zero_crossings(dy.data(), dy.size(), fs, true), t_frames,
                est[2].data());
  interp_events(zero_crossings(dy.data(), dy.size(), fs, false), t_frames,
                est[3].data());

  for (size_t i = 0; i < F; ++i) {
    bool usable = true;
    double mean = 0.0;
    for (int j = 0; j < 4; ++j) {
      usable = usable && est[j][i] > 0.0;
      mean += est[j][i];
    }
    mean /= 4.0;
    double dev = 0.0;
    for (int j = 0; j < 4; ++j)
      dev += (est[j][i] - mean) * (est[j][i] - mean);
    dev = std::sqrt(dev / 3.0);
    const bool ok = usable && mean >= boundary / 2.0 && mean <= boundary &&
                    mean >= f0_floor && mean <= f0_ceil;
    cand[i] = ok ? mean : 0.0;
    score[i] = ok ? dev / std::max(mean, kEps) : 1e5;
  }
}

struct Section { int64_t s, e; };  // [s, e)

std::vector<Section> voiced_sections(const std::vector<double>& f0) {
  std::vector<Section> out;
  int64_t start = -1;
  for (int64_t i = 0; i < static_cast<int64_t>(f0.size()); ++i) {
    if (f0[i] > 0.0 && start < 0) start = i;
    else if (f0[i] == 0.0 && start >= 0) {
      out.push_back({start, i});
      start = -1;
    }
  }
  if (start >= 0) out.push_back({start, static_cast<int64_t>(f0.size())});
  return out;
}

double select_best(double ref, const double* cands, int64_t n_bands,
                   int64_t stride, double allowed_range) {
  if (ref <= 0.0) return 0.0;
  double best = 0.0, best_ratio = 1e30;
  for (int64_t b = 0; b < n_bands; ++b) {
    const double c = cands[b * stride];
    if (c <= 0.0) continue;
    const double ratio = std::fabs(c - ref) / ref;
    if (ratio < best_ratio) {
      best_ratio = ratio;
      best = c;
    }
  }
  return best_ratio < allowed_range ? best : 0.0;
}

}  // namespace

extern "C" {

// wav: n samples.  out: n_frames = n / hop + 1 doubles, F0 (Hz), 0 at
// unvoiced frames.  Returns 0 on success.
int smart_world_f0(const double* wav, int64_t n, int sr, int hop,
                   double f0_floor, double f0_ceil,
                   double channels_in_octave, double allowed_range,
                   double* out, int64_t n_frames) {
  if (n <= 0 || hop <= 0 || n_frames != n / hop + 1) return 1;
  const int64_t F = n_frames;
  std::vector<double> t_frames(F);
  for (int64_t i = 0; i < F; ++i)
    t_frames[i] = static_cast<double>(i) * hop / sr;

  const auto x = low_cut(wav, n, sr);

  const int n_bands = static_cast<int>(
      std::ceil(std::log2(f0_ceil / f0_floor) * channels_in_octave));
  std::vector<double> cands(static_cast<size_t>(n_bands) * F);
  std::vector<double> scores(static_cast<size_t>(n_bands) * F);
  {
    std::vector<std::thread> workers;
    workers.reserve(n_bands);
    for (int b = 0; b < n_bands; ++b) {
      workers.emplace_back([&, b] {
        const double boundary =
            f0_floor * std::pow(2.0, (b + 1) / channels_in_octave);
        band_candidates(x, sr, t_frames, boundary, f0_floor, f0_ceil,
                        cands.data() + static_cast<size_t>(b) * F,
                        scores.data() + static_cast<size_t>(b) * F);
      });
    }
    for (auto& w : workers) w.join();
  }

  // best candidate per frame (first minimal score, like np.argmin)
  std::vector<double> f0(F, 0.0);
  for (int64_t i = 0; i < F; ++i) {
    int best = 0;
    for (int b = 1; b < n_bands; ++b)
      if (scores[static_cast<size_t>(b) * F + i] <
          scores[static_cast<size_t>(best) * F + i])
        best = b;
    if (scores[static_cast<size_t>(best) * F + i] < 1e5)
      f0[i] = cands[static_cast<size_t>(best) * F + i];
  }

  const double frame_period_ms = static_cast<double>(hop) / sr * 1000.0;
  const int voice_range_minimum = std::max(
      static_cast<int>(0.5 + 1000.0 / frame_period_ms / f0_floor) * 2 + 1,
      3);

  // FixStep1: zero relative jumps > allowed_range
  {
    std::vector<double> prev = f0;
    for (int64_t i = 0; i < std::min<int64_t>(voice_range_minimum, F); ++i)
      f0[i] = 0.0;
    for (int64_t i = voice_range_minimum; i < F; ++i) {
      if (prev[i] == 0.0) continue;
      const double rel =
          std::fabs(prev[i] - prev[i - 1]) / (prev[i] + kEps);
      if (rel > allowed_range) f0[i] = 0.0;
    }
  }
  // FixStep2: drop short voiced runs
  for (const auto& sec : voiced_sections(f0))
    if (sec.e - sec.s < voice_range_minimum)
      std::fill(f0.begin() + sec.s, f0.begin() + sec.e, 0.0);
  // FixStep3: extend forward from the candidate pool
  {
    const auto secs = voiced_sections(f0);
    for (size_t k = 0; k < secs.size(); ++k) {
      const int64_t limit =
          (k + 1 < secs.size()) ? secs[k + 1].s : F;
      double ref = f0[secs[k].e - 1];
      for (int64_t i = secs[k].e; i < limit; ++i) {
        const double nxt =
            select_best(ref, cands.data() + i, n_bands, F, allowed_range);
        if (nxt == 0.0) break;
        f0[i] = nxt;
        ref = nxt;
      }
    }
  }
  // FixStep4: extend backward
  {
    const auto secs = voiced_sections(f0);
    for (size_t k = 0; k < secs.size(); ++k) {
      const int64_t limit = (k > 0) ? secs[k - 1].e : 0;
      double ref = f0[secs[k].s];
      for (int64_t i = secs[k].s - 1; i >= limit; --i) {
        const double prv =
            select_best(ref, cands.data() + i, n_bands, F, allowed_range);
        if (prv == 0.0) break;
        f0[i] = prv;
        ref = prv;
      }
    }
  }

  std::copy(f0.begin(), f0.end(), out);
  return 0;
}

// StoneMask refinement of a DIO contour (in/out over `f0`).
int smart_stonemask(const double* wav, int64_t n, int sr, int hop,
                    double f0_floor, double f0_ceil, double* f0,
                    int64_t n_frames) {
  if (n <= 0 || hop <= 0) return 1;

  auto refine_once = [&](double t, double cur) -> double {
    const int half = static_cast<int>(1.5 * sr / cur + 0.5);
    const int64_t center = static_cast<int64_t>(std::llround(t * sr));
    const int seg_len = 2 * half + 1;
    std::vector<double> seg(seg_len, 0.0);
    const int64_t first = center - half;
    const int64_t lo = std::max<int64_t>(0, first);
    const int64_t hi = std::min<int64_t>(n, center + half + 1);
    if (hi <= lo) return 0.0;
    for (int64_t i = lo; i < hi; ++i) seg[i - first] = wav[i];

    std::vector<double> main_w(seg_len), diff_w(seg_len);
    for (int i = 0; i < seg_len; ++i) {
      const double bt = static_cast<double>(i - half) / sr;
      const double ph = 2.0 * kPi * bt * cur / 3.0;
      main_w[i] = 0.42 + 0.5 * std::cos(ph) + 0.08 * std::cos(2.0 * ph);
    }
    for (int i = 1; i + 1 < seg_len; ++i)
      diff_w[i] = -(main_w[i + 1] - main_w[i - 1]) / 2.0;
    diff_w[0] = -main_w[1] / 2.0;
    diff_w[seg_len - 1] = main_w[seg_len - 2] / 2.0;

    const size_t fft_size = next_pow2(seg_len) * 2;
    std::vector<double> xm(fft_size, 0.0), xd(fft_size, 0.0);
    for (int i = 0; i < seg_len; ++i) {
      xm[i] = seg[i] * main_w[i];
      xd[i] = seg[i] * diff_w[i];
    }
    auto X = rfft(xm.data(), fft_size, fft_size);
    auto D = rfft(xd.data(), fft_size, fft_size);

    const int n_harm =
        std::min(static_cast<int>(sr / 2.0 / cur), 6);
    if (n_harm < 1) return 0.0;
    double num = 0.0, den = 0.0;
    for (int h = 1; h <= n_harm; ++h) {
      const int k = static_cast<int>(
          std::round(cur * h * static_cast<double>(fft_size) / sr));
      if (k >= static_cast<int>(fft_size / 2 + 1)) break;
      const double xr = X[k].real(), xi = X[k].imag();
      const double dr = D[k].real(), di = D[k].imag();
      const double power = xr * xr + xi * xi;
      const double freq = static_cast<double>(k) * sr / fft_size;
      const double inst =
          freq + (xr * di - xi * dr) / std::max(power, kEps) * sr /
                     (2.0 * kPi);
      num += power * inst * h;
      den += power * h * h;
    }
    if (den <= kEps) return 0.0;
    const double refined = num / den;
    if (!std::isfinite(refined) || refined < f0_floor / 2.0 ||
        refined > f0_ceil * 1.2)
      return 0.0;
    return refined;
  };

  const int hw = std::max(1u, std::thread::hardware_concurrency());
  const int n_threads = static_cast<int>(
      std::min<int64_t>(hw, std::max<int64_t>(n_frames, 1)));
  std::vector<std::thread> workers;
  workers.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) {
    workers.emplace_back([&, t] {
      for (int64_t i = t; i < n_frames; i += n_threads) {
        if (f0[i] <= 0.0) continue;
        const double time = static_cast<double>(i) * hop / sr;
        const double r1 = refine_once(time, f0[i]);
        if (r1 <= 0.0) continue;
        const double r2 = refine_once(time, r1);
        const double refined = r2 > 0.0 ? r2 : r1;
        if (std::fabs(refined - f0[i]) / f0[i] < 0.18) f0[i] = refined;
      }
    });
  }
  for (auto& w : workers) w.join();
  return 0;
}

}  // extern "C"
