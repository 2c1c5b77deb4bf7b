// Single-threaded CPU cost model of the reference CoGAPS hot loop, used to
// measure the "1x" baseline for bench.py on THIS machine (the reference
// R/C++ package itself cannot be built here: no R, no boost).
//
// It reproduces the reference's per-update cost structure (not its code):
// each Gibbs atom-update evaluates alphaParameters — two multiply-add
// reductions over a full data row (reference:
// src/gibbs_sampler/DenseNormalModel.cpp:162-183) — and applies a rank-1
// AP-row update (cpp:243-258). The A sampler reduces over nSamples, the P
// sampler over nGenes; updates alternate with the same Poisson(nAtoms)
// weighting as the driver (src/GapsRunner.cpp:293-296). RNG and
// truncated-normal draws are modeled with a cheap LCG + expf, matching the
// reference's lookup-table approach in spirit (src/math/Random.cpp:178-200).
//
// Build: g++ -O3 -march=native -funroll-loops -o baseline_ref baseline_ref.cpp
// Run:   ./baseline_ref <nGenes> <nSamples> <k> <nUpdates>
// Prints: updates_per_second <float>

#include <cstdio>
#include <cstdlib>
#include <cmath>
#include <cstdint>
#include <vector>
#include <chrono>

static inline uint32_t lcg(uint64_t &s)
{
    s = s * 6364136223846793005ull + 1442695040888963407ull;
    return static_cast<uint32_t>(s >> 32);
}

static inline float uni(uint64_t &s)
{
    return (lcg(s) >> 8) * (1.0f / 16777216.0f);
}

int main(int argc, char **argv)
{
    unsigned nGenes = argc > 1 ? atoi(argv[1]) : 1363;
    unsigned nSamples = argc > 2 ? atoi(argv[2]) : 9;
    unsigned k = argc > 3 ? atoi(argv[3]) : 7;
    uint64_t nUpdates = argc > 4 ? atoll(argv[4]) : 2000000;

    uint64_t seed = 42;
    // data + uncertainty + AP caches, column-major like the reference
    std::vector<float> D(nGenes * nSamples), invS2(nGenes * nSamples),
        AP(nGenes * nSamples);
    for (size_t i = 0; i < D.size(); ++i)
    {
        D[i] = 10.0f * uni(seed);
        float s = D[i] > 1.0f ? 0.1f * D[i] : 0.1f;
        invS2[i] = 1.0f / (s * s);
        AP[i] = 5.0f * uni(seed);
    }
    std::vector<float> A(nGenes * k), P(nSamples * k);
    for (auto &x : A) x = uni(seed);
    for (auto &x : P) x = uni(seed);

    // the reference alternates samplers with Poisson(nAtoms) counts; atom
    // counts are proportional to the bin counts (nGenes*k vs nSamples*k),
    // so updates split in that ratio.
    double fracA = static_cast<double>(nGenes) / (nGenes + nSamples);

    volatile float sink = 0.0f;
    auto t0 = std::chrono::steady_clock::now();
    for (uint64_t u = 0; u < nUpdates; ++u)
    {
        bool isA = uni(seed) < fracA;
        unsigned len = isA ? nSamples : nGenes;
        unsigned nr = isA ? nGenes : nSamples;
        unsigned r = lcg(seed) % nr;
        unsigned c = lcg(seed) % k;

        // alphaParameters: s = sum other^2 * invS2, s_mu = sum other*(D-AP)*invS2
        // (reference: DenseNormalModel.cpp:162-183). Row-major walk over the
        // data row, strided access into the partner factor.
        const float *other = isA ? &P[c * nSamples] : &A[c * nGenes];
        float sAcc = 0.0f, sMu = 0.0f;
        size_t row0 = isA ? static_cast<size_t>(r) * nSamples
                          : static_cast<size_t>(r); // P model sees transposed D
        size_t stride = isA ? 1 : nSamples;
        for (unsigned i = 0; i < len; ++i)
        {
            size_t ix = row0 + i * stride;
            float o = other[i];
            float w = invS2[ix];
            sAcc += o * o * w;
            sMu += o * (D[ix] - AP[ix]) * w;
        }

        // gibbs-mass draw cost model: one exp + one sqrt like the
        // table-inverted truncated normal (src/math/Random.cpp:178-191)
        float mean = sAcc > 1e-10f ? sMu / sAcc : 0.0f;
        float sd = 1.0f / std::sqrt(sAcc + 1e-10f);
        float mass = mean + sd * (uni(seed) - 0.5f) * 2.0f;
        mass = mass > 0 ? mass : expf(-uni(seed));

        // accept ~50%: rank-1 AP row update (DenseNormalModel.cpp:243-258)
        if (uni(seed) < 0.5f)
        {
            float delta = mass * 0.1f;
            for (unsigned i = 0; i < len; ++i)
            {
                size_t ix = row0 + i * stride;
                AP[ix] += delta * other[i];
            }
            if (isA) A[c * nGenes + r] += delta; else P[c * nSamples + r] += delta;
        }
        sink += mass;
    }
    auto t1 = std::chrono::steady_clock::now();
    double secs = std::chrono::duration<double>(t1 - t0).count();
    (void)sink;
    printf("updates_per_second %.1f\n", nUpdates / secs);
    return 0;
}
