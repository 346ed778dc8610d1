// g3native — host-side native kernels for g3py_tpu.
//
// The reference delegated its host-side hot loops to numba
// (gelman_rubin, /root/reference/g3py/bayesian/average.py:12,653) and to
// Theano-generated C.  This library provides the equivalents as a small
// C++ core exposed through ctypes (see g3py_tpu/native.py):
//
//   * lagged autocovariance matrices (the inner loop of the mIS/mISadj
//     Markov-CLT covariance estimators, reference average.py:786-862)
//   * batch-means covariance (reference average.py:795-808)
//   * univariate Gelman-Rubin R-hat (reference average.py:672-682)
//
// All matrices are row-major float64.  Compile:
//   g++ -O3 -march=native -shared -fPIC -o libg3native.so g3native.cpp

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// chain: (n, d) row-major. out: (d, d) autocovariance at the given lag:
// (1/n) * sum_t (x_t - mu)(x_{t+lag} - mu)^T
void autocov_matrix(const double* chain, int64_t n, int64_t d, int64_t lag,
                    double* out) {
    std::vector<double> mu(d, 0.0);
    for (int64_t t = 0; t < n; ++t)
        for (int64_t j = 0; j < d; ++j) mu[j] += chain[t * d + j];
    for (int64_t j = 0; j < d; ++j) mu[j] /= static_cast<double>(n);

    std::memset(out, 0, sizeof(double) * d * d);
    const int64_t m = n - lag;
    for (int64_t t = 0; t < m; ++t) {
        const double* a = chain + t * d;
        const double* b = chain + (t + lag) * d;
        for (int64_t i = 0; i < d; ++i) {
            const double ai = a[i] - mu[i];
            double* row = out + i * d;
            for (int64_t j = 0; j < d; ++j) row[j] += ai * (b[j] - mu[j]);
        }
    }
    const double inv_n = 1.0 / static_cast<double>(n);
    for (int64_t k = 0; k < d * d; ++k) out[k] *= inv_n;
}

// Paired-lag autocovariance: Gamma(2i) + Gamma(2i+1)  (average.py:790-792).
void autocov_matrix_2(const double* chain, int64_t n, int64_t d, int64_t i,
                      double* out) {
    std::vector<double> tmp(d * d);
    autocov_matrix(chain, n, d, 2 * i, out);
    autocov_matrix(chain, n, d, 2 * i + 1, tmp.data());
    for (int64_t k = 0; k < d * d; ++k) out[k] += tmp[k];
}

// Batch-means Markov-CLT covariance estimator (average.py:795-808).
// chain: (n, d); out: (d, d).
void sigma_batch(const double* chain, int64_t n, int64_t d, int64_t batch_size,
                 double* out) {
    if (batch_size < 1) batch_size = 1;
    const int64_t a = n / batch_size;
    if (a < 2) {
        std::memset(out, 0, sizeof(double) * d * d);
        return;
    }
    // grand mean over ALL entries (the reference used np.mean(chain) —
    // a scalar across dims; kept for parity)
    double mu = 0.0;
    for (int64_t k = 0; k < n * d; ++k) mu += chain[k];
    mu /= static_cast<double>(n) * static_cast<double>(d);

    std::vector<double> block(a * d, 0.0);
    for (int64_t bi = 0; bi < a; ++bi)
        for (int64_t t = 0; t < batch_size; ++t) {
            const double* row = chain + (bi * batch_size + t) * d;
            for (int64_t j = 0; j < d; ++j) block[bi * d + j] += row[j];
        }
    const double inv_b = 1.0 / static_cast<double>(batch_size);
    for (int64_t k = 0; k < a * d; ++k) block[k] = block[k] * inv_b - mu;

    std::memset(out, 0, sizeof(double) * d * d);
    for (int64_t bi = 0; bi < a; ++bi) {
        const double* row = block.data() + bi * d;
        for (int64_t i = 0; i < d; ++i) {
            double* orow = out + i * d;
            const double ri = row[i];
            for (int64_t j = 0; j < d; ++j) orow[j] += ri * row[j];
        }
    }
    const double scale = static_cast<double>(batch_size)
                         / static_cast<double>(a - 1);
    for (int64_t k = 0; k < d * d; ++k) out[k] *= scale;
}

// Univariate R-hat over (nwalkers, nsamples, ndim) chains; out: (ndim,)
// per-dim R-hat (average.py:672-682). Returns max |R-1| as the result.
double gelman_rubin_uni(const double* chains, int64_t w, int64_t n, int64_t d,
                        double* rhat_out) {
    double worst = 0.0;
    for (int64_t j = 0; j < d; ++j) {
        // per-walker means/vars for dimension j
        double grand = 0.0;
        std::vector<double> means(w), vars(w);
        for (int64_t c = 0; c < w; ++c) {
            double m = 0.0;
            for (int64_t t = 0; t < n; ++t) m += chains[(c * n + t) * d + j];
            m /= static_cast<double>(n);
            double v = 0.0;
            for (int64_t t = 0; t < n; ++t) {
                const double x = chains[(c * n + t) * d + j] - m;
                v += x * x;
            }
            v /= static_cast<double>(n - 1);
            means[c] = m;
            vars[c] = v;
            grand += m;
        }
        grand /= static_cast<double>(w);
        double B = 0.0, W = 0.0;
        for (int64_t c = 0; c < w; ++c) {
            B += (means[c] - grand) * (means[c] - grand);
            W += vars[c];
        }
        B *= static_cast<double>(n) / static_cast<double>(w - 1);
        W /= static_cast<double>(w);
        const double vhat = W * (n - 1) / static_cast<double>(n) + B / n;
        const double r = (W > 0.0) ? std::sqrt(vhat / W) : 1.0;
        if (rhat_out) rhat_out[j] = r;
        const double dev = std::fabs(r - 1.0);
        if (dev > worst) worst = dev;
    }
    return worst;
}

}  // extern "C"
