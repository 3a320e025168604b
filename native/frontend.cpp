// Native (C++) streaming audio frontend: PCM s16le -> log-mel spectrogram.
//
// TPU-native equivalent of the reference's stateful DSP preprocessor
// (reference src/preprocessor.cpp:330-395): i16 -> f32 scale 1/32768,
// pre-emphasis 0.97 with cross-call carry of last_sample, center-pad
// emulation via an initial n_fft/2-zero buffer, Hann(400) window zero-padded
// to 512, radix-2 Cooley-Tukey FFT with precomputed twiddles + bit-reversal
// (reference src/preprocessor.cpp:80-161), power spectrum, mel filterbank
// matvec, log(x + 2^-24), and ring-buffer carry-over of unconsumed samples
// (reference src/preprocessor.cpp:388-394).
//
// Differences from the reference, by design:
//   - batched: one frontend object processes S parallel streams per call
//     (the serving engine's fixed cadence guarantees uniform advance);
//   - produces mel on the HOST so only [S, T, n_mels] floats cross the
//     host->TPU link (the device-side jit path needs [S, T, n_fft] frames:
//     4x the bytes).
//
// C ABI only; bound from Python via ctypes (no pybind11 in this image).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct FFT {
    int n = 0;
    std::vector<int> rev;          // bit-reversal permutation
    std::vector<float> tw_re, tw_im;  // twiddles per stage, packed

    void init(int n_) {
        n = n_;
        rev.assign(n, 0);
        int logn = 0;
        while ((1 << logn) < n) ++logn;
        for (int i = 0; i < n; ++i) {
            int r = 0;
            for (int b = 0; b < logn; ++b)
                if (i & (1 << b)) r |= 1 << (logn - 1 - b);
            rev[i] = r;
        }
        // per stage m = 2,4,...,n: n/2 twiddles total per stage-half
        tw_re.clear();
        tw_im.clear();
        for (int m = 2; m <= n; m <<= 1) {
            for (int j = 0; j < m / 2; ++j) {
                double ang = -2.0 * M_PI * j / m;
                tw_re.push_back((float)std::cos(ang));
                tw_im.push_back((float)std::sin(ang));
            }
        }
    }

    // in-place complex FFT on interleaved re/im arrays of length n
    void run(float* re, float* im) const {
        for (int i = 0; i < n; ++i) {
            int r = rev[i];
            if (i < r) {
                std::swap(re[i], re[r]);
                std::swap(im[i], im[r]);
            }
        }
        size_t tw_off = 0;
        for (int m = 2; m <= n; m <<= 1) {
            int half = m / 2;
            for (int k = 0; k < n; k += m) {
                for (int j = 0; j < half; ++j) {
                    float wr = tw_re[tw_off + j], wi = tw_im[tw_off + j];
                    int a = k + j, b = k + j + half;
                    float xr = re[b] * wr - im[b] * wi;
                    float xi = re[b] * wi + im[b] * wr;
                    re[b] = re[a] - xr;
                    im[b] = im[a] - xi;
                    re[a] += xr;
                    im[a] += xi;
                }
            }
            tw_off += half;
        }
    }
};

struct Frontend {
    int n_streams = 1;
    int n_fft = 512;
    int win_length = 400;
    int hop = 160;
    int n_mels = 128;
    int n_freqs = 257;
    float preemph = 0.97f;
    float log_zero_guard = 5.960464477539063e-08f;  // 2^-24

    std::vector<float> window;       // [n_fft] zero-padded
    std::vector<float> filterbank;   // [n_mels, n_freqs]
    // Mel filters are triangles: ~1.5% of each row is nonzero. Per-row
    // [k0, k1) nonzero bands skip the leading/trailing zeros -- bit-exact
    // vs the dense accumulation (adding +0.0f is the identity) and ~10x
    // less work in the serving hot loop.
    std::vector<int> fb_k0, fb_k1;   // [n_mels]
    FFT fft;

    // per-stream state
    std::vector<float> last_sample;             // [S]
    std::vector<std::vector<float>> residue;    // [S][<n_fft + incoming]

    void reset_stream(int s) {
        last_sample[s] = 0.0f;
        // Residue lengths must stay uniform across streams (the batch
        // advances in lockstep). A stream reset mid-session keeps the shared
        // length but zero content -- as if it had been hearing silence; a
        // fresh/global reset uses the center-pad emulation length
        // (reference src/preprocessor.cpp:220-222).
        size_t len = (size_t)n_fft / 2;
        for (int o = 0; o < n_streams; ++o)
            if (o != s && !residue[o].empty()) {
                len = residue[o].size();
                break;
            }
        residue[s].assign(len, 0.0f);
    }
};

}  // namespace

extern "C" {

void* nemo_frontend_create(int n_streams, int n_fft, int win_length, int hop,
                           int n_mels, float preemph, float log_zero_guard,
                           const float* window, const float* filterbank) {
    auto* f = new Frontend();
    f->n_streams = n_streams;
    f->n_fft = n_fft;
    f->win_length = win_length;
    f->hop = hop;
    f->n_mels = n_mels;
    f->n_freqs = n_fft / 2 + 1;
    f->preemph = preemph;
    f->log_zero_guard = log_zero_guard;
    f->window.assign(window, window + n_fft);
    f->filterbank.assign(filterbank, filterbank + (size_t)n_mels * f->n_freqs);
    f->fb_k0.assign(n_mels, 0);
    f->fb_k1.assign(n_mels, 0);
    for (int m = 0; m < n_mels; ++m) {
        const float* fb = f->filterbank.data() + (size_t)m * f->n_freqs;
        int k0 = 0, k1 = f->n_freqs;
        while (k0 < k1 && fb[k0] == 0.0f) ++k0;
        while (k1 > k0 && fb[k1 - 1] == 0.0f) --k1;
        f->fb_k0[m] = k0;
        f->fb_k1[m] = k1;
    }
    f->fft.init(n_fft);
    f->last_sample.assign(n_streams, 0.0f);
    f->residue.resize(n_streams);
    for (int s = 0; s < n_streams; ++s) f->reset_stream(s);
    return f;
}

void nemo_frontend_free(void* h) { delete (Frontend*)h; }

void nemo_frontend_reset(void* h, int stream) {
    auto* f = (Frontend*)h;
    if (stream < 0) {
        // Global reset = construction state. Must NOT route through
        // reset_stream: that inherits the shared residue LENGTH from the
        // other (not-yet-reset) streams, so a mid-session global reset
        // would keep the steady-state length instead of the fresh
        // center-pad length -- 2 extra frames on the next process() vs a
        // freshly constructed frontend (found by TonesSampler reuse).
        for (int s = 0; s < f->n_streams; ++s) {
            f->last_sample[s] = 0.0f;
            f->residue[s].assign((size_t)f->n_fft / 2, 0.0f);
        }
    } else {
        f->reset_stream(stream);
    }
}

// Number of frames the next process() call will produce given n new samples
// (all streams advance uniformly; reference src/preprocessor.cpp:313-328).
int nemo_frontend_n_frames(void* h, int n_samples) {
    auto* f = (Frontend*)h;
    long avail = (long)f->residue[0].size() + n_samples;
    if (avail < f->n_fft) return 0;
    return (int)((avail - f->n_fft) / f->hop + 1);
}

namespace {

// One stream's full step: append pre-emphasized samples, emit n_frames of
// log-mel, keep the unconsumed tail. Shared by the lockstep batched entry
// (uniform advance) and the ragged serving entry (per-slot advance).
int process_stream(Frontend* f, int s, const int16_t* in, int n_samples,
                   float* mel_out) {
    const int n_fft = f->n_fft, hop = f->hop;
    const int n_mels = f->n_mels, n_freqs = f->n_freqs;
    auto& buf = f->residue[s];
    const size_t residue_len = buf.size();
    const long avail = (long)residue_len + n_samples;
    const int n_frames =
        avail < n_fft ? 0 : (int)((avail - n_fft) / hop + 1);

    buf.resize(residue_len + n_samples);
    // i16 -> f32, pre-emphasis with carry (reference
    // src/preprocessor.cpp:349-356)
    float prev = f->last_sample[s];
    for (int i = 0; i < n_samples; ++i) {
        float x = (float)in[i] / 32768.0f;
        buf[residue_len + i] = x - f->preemph * prev;
        prev = x;
    }
    f->last_sample[s] = prev;

    std::vector<float> re(n_fft), im(n_fft), power(n_freqs);
    for (int t = 0; t < n_frames; ++t) {
        const float* frame = buf.data() + (size_t)t * hop;
        for (int i = 0; i < n_fft; ++i) {
            re[i] = frame[i] * f->window[i];
            im[i] = 0.0f;
        }
        f->fft.run(re.data(), im.data());
        for (int k = 0; k < n_freqs; ++k)
            power[k] = re[k] * re[k] + im[k] * im[k];
        // mel = log(fb @ power + guard), banded over each row's nonzero
        // support (bit-exact vs dense: the skipped terms are +0.0f adds)
        float* row = mel_out + (size_t)t * n_mels;
        for (int m = 0; m < n_mels; ++m) {
            const float* fb = f->filterbank.data() + (size_t)m * n_freqs;
            float acc = 0.0f;
            const int k1 = f->fb_k1[m];
            for (int k = f->fb_k0[m]; k < k1; ++k) acc += fb[k] * power[k];
            row[m] = std::log(acc + f->log_zero_guard);
        }
    }

    // keep unconsumed tail (reference src/preprocessor.cpp:388-394)
    buf.erase(buf.begin(), buf.begin() + (size_t)n_frames * hop);
    return n_frames;
}

}  // namespace

// audio: [n_streams, n_samples] s16le. out_mel: [n_streams, n_frames, n_mels]
// f32 (row-major), n_frames from nemo_frontend_n_frames. Returns n_frames.
int nemo_frontend_process(void* h, const int16_t* audio, int n_samples,
                          float* out_mel) {
    auto* f = (Frontend*)h;
    const int n_frames = nemo_frontend_n_frames(h, n_samples);
    for (int s = 0; s < f->n_streams; ++s) {
        int got = process_stream(f, s, audio + (size_t)s * n_samples,
                                 n_samples,
                                 out_mel + (size_t)s * n_frames * f->n_mels);
        if (got != n_frames) return -1;  // uniform-advance invariant broken
    }
    return n_frames;
}

// --- ragged serving entry points (continuous batching: per-slot rates) -----

// Frames the next ragged process will produce for ONE stream fed n samples
// (per-stream residue; no uniform-advance assumption).
int nemo_frontend_n_frames_s(void* h, int stream, int n_samples) {
    auto* f = (Frontend*)h;
    if (stream < 0 || stream >= f->n_streams) return -1;
    long avail = (long)f->residue[stream].size() + n_samples;
    if (avail < f->n_fft) return 0;
    return (int)((avail - f->n_fft) / f->hop + 1);
}

// Reset one stream to the FRESH state (n_fft/2-zero center-pad residue,
// reference src/preprocessor.cpp:220-222) regardless of other streams'
// residue lengths -- the admission semantics of the ragged serving engine.
// (nemo_frontend_reset keeps residue lengths uniform for the lockstep
// batch; ragged streams have no such invariant.)
void nemo_frontend_reset_fresh(void* h, int stream) {
    auto* f = (Frontend*)h;
    f->last_sample[stream] = 0.0f;
    f->residue[stream].assign((size_t)f->n_fft / 2, 0.0f);
}

// Process an arbitrary subset of streams, each with its own sample count:
//   audio   -- concatenated s16le PCM, stream i's block at offsets[i],
//              counts[i] samples long;
//   slots   -- [n_fed] stream indices;
//   out_mel -- concatenated [sum(frames_i), n_mels] f32 in call order
//              (size it with nemo_frontend_n_frames_s per slot);
//   out_frames -- [n_fed] frames produced per slot.
// Returns the total frame count (or -1 on a bad slot index).
int nemo_frontend_process_ragged(void* h, const int16_t* audio,
                                 const long long* offsets,
                                 const int* slots, const int* counts,
                                 int n_fed, float* out_mel,
                                 int* out_frames) {
    auto* f = (Frontend*)h;
    long total = 0;
    for (int i = 0; i < n_fed; ++i) {
        const int s = slots[i];
        if (s < 0 || s >= f->n_streams) return -1;
        int got = process_stream(f, s, audio + offsets[i], counts[i],
                                 out_mel + total * f->n_mels);
        out_frames[i] = got;
        total += got;
    }
    return (int)total;
}

// Per-stream DSP state snapshot (ragged engines checkpoint slot by slot).
int nemo_frontend_residue_len_s(void* h, int stream) {
    auto* f = (Frontend*)h;
    return (int)f->residue[stream].size();
}

void nemo_frontend_get_state_s(void* h, int stream, float* out_last,
                               float* out_residue) {
    auto* f = (Frontend*)h;
    *out_last = f->last_sample[stream];
    std::memcpy(out_residue, f->residue[stream].data(),
                f->residue[stream].size() * sizeof(float));
}

void nemo_frontend_set_state_s(void* h, int stream, float last,
                               const float* residue, int residue_len) {
    auto* f = (Frontend*)h;
    f->last_sample[stream] = last;
    f->residue[stream].assign(residue, residue + residue_len);
}

// --- state snapshot (checkpoint/resume of a streaming session) -------------

// Residue length is uniform across streams; returns it.
int nemo_frontend_residue_len(void* h) {
    auto* f = (Frontend*)h;
    return (int)f->residue[0].size();
}

// out_last: [n_streams]; out_residue: [n_streams, residue_len]
void nemo_frontend_get_state(void* h, float* out_last, float* out_residue) {
    auto* f = (Frontend*)h;
    const size_t len = f->residue[0].size();
    for (int s = 0; s < f->n_streams; ++s) {
        out_last[s] = f->last_sample[s];
        std::memcpy(out_residue + (size_t)s * len, f->residue[s].data(),
                    len * sizeof(float));
    }
}

void nemo_frontend_set_state(void* h, const float* last, const float* residue,
                             int residue_len) {
    auto* f = (Frontend*)h;
    for (int s = 0; s < f->n_streams; ++s) {
        f->last_sample[s] = last[s];
        f->residue[s].assign(residue + (size_t)s * residue_len,
                             residue + (size_t)(s + 1) * residue_len);
    }
}

}  // extern "C"
