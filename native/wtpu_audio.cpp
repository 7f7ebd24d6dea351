// whisper_tpu native audio frontend.
//
// C implementation of the log-mel pipeline (same math as
// whisper_tpu/audio/mel.py, which is golden-verified against the reference
// engine) plus PCM helpers, exposed with a plain C ABI for ctypes.
// The reference computes its mel on CPU threads too
// (reference: src/whisper.cpp:3008-3271); in a TPU deployment this keeps
// host-side preprocessing off the Python GIL while device batches run.
//
// Build: make -C native  (produces libwtpu_audio.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kSampleRate = 16000;
constexpr int kNFft = 400;
constexpr int kHop = 160;
constexpr int kNBins = kNFft / 2 + 1;    // 201
constexpr int kChunkPad = kSampleRate * 30;
constexpr int kReflectPad = kNFft / 2;   // 200

// ---------------------------------------------------------------------------
// Real DFT of a 400-sample frame via Cooley-Tukey radix-2 over complex
// doubles, with a naive DFT base case for the odd factor (400 = 16 * 25).
// Twiddles and the base-case DFT matrix are precomputed once.
// ---------------------------------------------------------------------------

struct FftPlan {
    // twiddle factors per stage for N in {400, 200, 100, 50}
    std::vector<std::vector<float>> tw_re, tw_im;
    std::vector<int> sizes;
    // 25-point DFT basis
    float base_re[25][25];
    float base_im[25][25];
    float hann[kNFft];

    FftPlan() {
        for (int n = kNFft; n % 2 == 0 && n > 25; n /= 2) {
            sizes.push_back(n);
            std::vector<float> re(n / 2), im(n / 2);
            for (int k = 0; k < n / 2; k++) {
                double t = -2.0 * M_PI * k / n;
                re[k] = (float) cos(t);
                im[k] = (float) sin(t);
            }
            tw_re.push_back(std::move(re));
            tw_im.push_back(std::move(im));
        }
        for (int k = 0; k < 25; k++) {
            for (int j = 0; j < 25; j++) {
                double t = -2.0 * M_PI * k * j / 25.0;
                base_re[k][j] = (float) cos(t);
                base_im[k][j] = (float) sin(t);
            }
        }
        for (int i = 0; i < kNFft; i++) {
            hann[i] = 0.5f * (1.0f - cosf(2.0f * (float) M_PI * i / kNFft));
        }
    }
};

const FftPlan g_plan;

// recursive complex FFT on real input laid out in (re, im) pairs
void fft_rec(const float * in, int stride, int n, int depth,
             float * out_re, float * out_im, float * scratch) {
    if (n == 25) {
        for (int k = 0; k < 25; k++) {
            float re = 0.f, im = 0.f;
            for (int j = 0; j < 25; j++) {
                const float v = in[j * stride];
                re += v * g_plan.base_re[k][j];
                im += v * g_plan.base_im[k][j];
            }
            out_re[k] = re;
            out_im[k] = im;
        }
        return;
    }
    const int half = n / 2;
    float * e_re = scratch;
    float * e_im = scratch + half;
    float * o_re = scratch + 2 * half;
    float * o_im = scratch + 3 * half;
    fft_rec(in, stride * 2, half, depth + 1, e_re, e_im, scratch + 4 * half);
    fft_rec(in + stride, stride * 2, half, depth + 1, o_re, o_im,
            scratch + 4 * half);

    const auto & wre = g_plan.tw_re[depth];
    const auto & wim = g_plan.tw_im[depth];
    for (int k = 0; k < half; k++) {
        const float tr = wre[k] * o_re[k] - wim[k] * o_im[k];
        const float ti = wre[k] * o_im[k] + wim[k] * o_re[k];
        out_re[k] = e_re[k] + tr;
        out_im[k] = e_im[k] + ti;
        out_re[k + half] = e_re[k] - tr;
        out_im[k + half] = e_im[k] - ti;
    }
}

void frame_power_spectrum(const float * windowed, float * power) {
    float out_re[kNFft], out_im[kNFft];
    float scratch[4 * kNFft];
    fft_rec(windowed, 1, kNFft, 0, out_re, out_im, scratch);
    for (int k = 0; k < kNBins; k++) {
        power[k] = out_re[k] * out_re[k] + out_im[k] * out_im[k];
    }
}

}  // namespace

extern "C" {

// Frame counts for a given sample count (mirrors pad_audio in mel.py).
void wtpu_mel_dims(int n_samples, int * n_len, int * n_len_org) {
    const int64_t padded = (int64_t) n_samples + kChunkPad + 2 * kReflectPad;
    *n_len = (int) ((padded - kNFft) / kHop);
    *n_len_org = 1 + (n_samples + kReflectPad - kNFft) / kHop;
}

// Log-mel spectrogram: out is (n_len, n_mel) row-major.
// Returns 0 on success.
int wtpu_log_mel(const float * samples, int n_samples,
                 const float * filters, int n_mel,
                 float * out, int n_threads) {
    if (n_samples < kReflectPad + 1) {
        return -1;
    }
    int n_len, n_len_org;
    wtpu_mel_dims(n_samples, &n_len, &n_len_org);

    std::vector<float> padded((size_t) n_samples + kChunkPad + 2 * kReflectPad,
                              0.0f);
    std::memcpy(padded.data() + kReflectPad, samples,
                sizeof(float) * n_samples);
    for (int i = 0; i < kReflectPad; i++) {
        padded[i] = samples[kReflectPad - i];
    }

    if (n_threads < 1) n_threads = 1;
    std::atomic<int> next_frame(0);

    auto worker = [&]() {
        std::vector<float> windowed(kNFft);
        std::vector<float> power(kNBins);
        while (true) {
            const int i = next_frame.fetch_add(1);
            if (i >= n_len) break;
            const float * src = padded.data() + (size_t) i * kHop;
            for (int j = 0; j < kNFft; j++) {
                windowed[j] = src[j] * g_plan.hann[j];
            }
            frame_power_spectrum(windowed.data(), power.data());
            float * dst = out + (size_t) i * n_mel;
            for (int m = 0; m < n_mel; m++) {
                const float * f = filters + (size_t) m * kNBins;
                double acc = 0.0;
                for (int k = 0; k < kNBins; k++) {
                    acc += (double) power[k] * f[k];
                }
                dst[m] = (float) log10(std::max(acc, 1e-10));
            }
        }
    };

    std::vector<std::thread> threads;
    for (int t = 1; t < n_threads; t++) threads.emplace_back(worker);
    worker();
    for (auto & th : threads) th.join();

    // global clamp + normalize
    double mmax = -1e20;
    const size_t total = (size_t) n_len * n_mel;
    for (size_t i = 0; i < total; i++) {
        if (out[i] > mmax) mmax = out[i];
    }
    mmax -= 8.0;
    for (size_t i = 0; i < total; i++) {
        if (out[i] < mmax) out[i] = (float) mmax;
        out[i] = (float) ((out[i] + 4.0) / 4.0);
    }
    return 0;
}

// Moving-|x| average used by token-level timestamps
// (semantics of get_signal_energy, reference: src/whisper.cpp:6949-6965).
void wtpu_signal_energy(const float * signal, int n_samples, int half_window,
                        float * out) {
    // prefix sums for O(n)
    std::vector<double> prefix((size_t) n_samples + 1, 0.0);
    for (int i = 0; i < n_samples; i++) {
        prefix[i + 1] = prefix[i] + std::fabs(signal[i]);
    }
    const double denom = 2.0 * half_window + 1.0;
    for (int i = 0; i < n_samples; i++) {
        const int lo = std::max(i - half_window, 0);
        const int hi = std::min(i + half_window + 1, n_samples);
        out[i] = (float) ((prefix[hi] - prefix[lo]) / denom);
    }
}

// Linear resampler (mono).
int wtpu_resample_linear(const float * in, int n_in, int sr_in,
                         float * out, int n_out, int sr_out) {
    if (n_in <= 1 || n_out <= 0) return -1;
    const double step = (double) sr_in / sr_out;
    for (int i = 0; i < n_out; i++) {
        const double t = i * step;
        const int i0 = std::min((int) t, n_in - 1);
        const int i1 = std::min(i0 + 1, n_in - 1);
        const double frac = t - i0;
        out[i] = (float) ((1.0 - frac) * in[i0] + frac * in[i1]);
    }
    return 0;
}

}  // extern "C"
