// Reference-equivalent CPU baseline for BASELINE.md.
//
// The reference (thuem/THUNDER) publishes no absolute throughput numbers and
// its full binary needs MPI (>= 3 ranks, appsrc/thunder.cpp:403), which this
// image lacks. This standalone harness reproduces the reference CPU E-step's
// computational structure from scratch on the SAME workload shape as
// /root/repo/bench.py, so particles/sec/core can be measured:
//
//   phase A (src/Optimiser.cpp:622-1136):
//     for rotation m: trilinear central-slice projection from the padded
//     FT volume (src/Projector.cpp:222-356)
//       for translation n: logL over ALL images x ring pixels
//       (logDataVSPrior_m_n, src/Optimiser.cpp:9187+, AVX via -O3 -mavx2)
//   insert (src/Reconstructor.cpp:569-928): per image, trilinear
//     scatter-add of value*CTF into F and CTF^2 into T + Hermitian mirror.
//
// With --full it instead measures a FULL local-search iteration per
// particle — the regime most refine iterations run in once the global
// search is done (searchType LOCAL, src/Optimiser.cpp:1138-1660):
//
//   phase B x N_PHASE (demo-representative 10 phases): per image, project
//     its M_L_R=125 support rotations (trilinear), evaluate the particle
//     filter likelihood over M_L_R x M_L_T=9 (logDataVSPrior per support
//     point, src/Optimiser.cpp:1294-1402),
//   insert with M_RECO=100 sampled poses per image
//     (Optimiser::reconstructRef draws mReco support points,
//     src/Optimiser.cpp:6711+).
//
// Single-threaded by default (the metric is per CORE); OMP_NUM_THREADS>1
// scales it for sanity checks. Compile: make (g++ -O3 -mavx2 -ffast-math).

#include <chrono>
#include <cmath>
#include <complex>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <string>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

using cf = std::complex<float>;

static const int N = 160;        // box
static const int PF = 2;         // padding factor
static const int M = N * PF;     // padded FT size
static const int N_IMG = 256;    // particles per step
static const int N_ROT = 1024;   // scan rotations
static const int N_TRA = 16;     // scan translations
static const int R_BAND = 40;    // frequency band (shells)

struct Vec3 { float x, y, z; };
struct Mat3 { float m[9]; };

static inline cf trilinear(const std::vector<cf>& vol, float zc, float yc,
                           float xc) {
    // centered coords -> array indices
    float z = zc + M / 2, y = yc + M / 2, x = xc + M / 2;
    int z0 = (int)std::floor(z), y0 = (int)std::floor(y), x0 = (int)std::floor(x);
    if (z0 < 0 || y0 < 0 || x0 < 0 || z0 >= M - 1 || y0 >= M - 1 || x0 >= M - 1)
        return cf(0.f, 0.f);
    float fz = z - z0, fy = y - y0, fx = x - x0;
    cf acc(0.f, 0.f);
    for (int dz = 0; dz < 2; dz++)
        for (int dy = 0; dy < 2; dy++)
            for (int dx = 0; dx < 2; dx++) {
                float w = (dz ? fz : 1 - fz) * (dy ? fy : 1 - fy) *
                          (dx ? fx : 1 - fx);
                acc += w * vol[size_t(z0 + dz) * M * M + size_t(y0 + dy) * M +
                               (x0 + dx)];
            }
    return acc;
}

static inline void scatter(std::vector<cf>& F, std::vector<float>& T, float zc,
                           float yc, float xc, cf fv, float tv) {
    float z = zc + M / 2, y = yc + M / 2, x = xc + M / 2;
    int z0 = (int)std::floor(z), y0 = (int)std::floor(y), x0 = (int)std::floor(x);
    if (z0 < 0 || y0 < 0 || x0 < 0 || z0 >= M - 1 || y0 >= M - 1 || x0 >= M - 1)
        return;
    float fz = z - z0, fy = y - y0, fx = x - x0;
    for (int dz = 0; dz < 2; dz++)
        for (int dy = 0; dy < 2; dy++)
            for (int dx = 0; dx < 2; dx++) {
                float w = (dz ? fz : 1 - fz) * (dy ? fy : 1 - fy) *
                          (dx ? fx : 1 - fx);
                size_t i = size_t(z0 + dz) * M * M + size_t(y0 + dy) * M +
                           (x0 + dx);
                F[i] += w * fv;
                T[i] += w * tv;
            }
}

static const int N_PHASE = 10;   // representative particle-filter phases
static const int M_L_R = 125;    // local rotation support points (demo)
static const int M_L_T = 9;      // local translation support points (demo)
static const int M_RECO = 100;   // reconstruction pose draws (demo)

int main(int argc, char** argv) {
    bool full = argc > 1 && std::string(argv[1]) == "--full";
    std::mt19937 rng(0);
    std::normal_distribution<float> nrm(0.f, 1.f);
    std::uniform_real_distribution<float> uni(0.f, 1.f);

    // ring pixel set (half plane, like allocPreCalIdx
    // src/Optimiser.cpp:7991-8041)
    std::vector<int> col, row;
    for (int i = 0; i <= R_BAND + 1; i++)
        for (int j = -R_BAND - 1; j <= R_BAND + 1; j++) {
            if (i == 0 && j < 0) continue;
            double u2 = double(i) * i + double(j) * j;
            double v = std::round(std::sqrt(u2));
            if (u2 >= 3.0 * 3.0 && u2 < double(R_BAND) * R_BAND && v >= 3 &&
                v < R_BAND) {
                col.push_back(i);
                row.push_back(j);
            }
        }
    int P = (int)col.size();

    // insert pixel set: the reference inserts the RECONSTRUCTION band
    // rU = r + maxR/3 (Model::updateRU, src/Model.cpp:1543-1568), shells
    // [0, rU) — wider than the search band (r3's harness reused the
    // search ring, under-counting the insert ~2.8x)
    const int R_U = R_BAND + (N / 2 - 2) / 3;  // 40 + 26 = 66
    std::vector<int> col_u, row_u;
    for (int i = 0; i <= R_U + 1; i++)
        for (int j = -R_U - 1; j <= R_U + 1; j++) {
            if (i == 0 && j < 0) continue;
            double u2 = double(i) * i + double(j) * j;
            double v = std::round(std::sqrt(u2));
            if (u2 < double(R_U) * R_U && v < R_U) {
                col_u.push_back(i);
                row_u.push_back(j);
            }
        }
    int P_U = (int)col_u.size();

    // random padded FT volume (projectee built once per iteration in the
    // reference; its FFT cost is excluded on both sides)
    std::vector<cf> vol((size_t)M * M * M);
    for (auto& v : vol) v = cf(nrm(rng), nrm(rng));

    // random rotations (uniform quaternions)
    std::vector<Mat3> rot(N_ROT);
    for (auto& R : rot) {
        float q[4];
        float s = 0;
        for (int k = 0; k < 4; k++) { q[k] = nrm(rng); s += q[k] * q[k]; }
        s = 1.f / std::sqrt(s);
        for (int k = 0; k < 4; k++) q[k] *= s;
        float a = q[0], b = q[1], c = q[2], d = q[3];
        R.m[0] = a*a+b*b-c*c-d*d; R.m[1] = 2*(b*c-a*d); R.m[2] = 2*(b*d+a*c);
        R.m[3] = 2*(b*c+a*d); R.m[4] = a*a-b*b+c*c-d*d; R.m[5] = 2*(c*d-a*b);
        R.m[6] = 2*(b*d-a*c); R.m[7] = 2*(c*d+a*b); R.m[8] = a*a-b*b-c*c+d*d;
    }

    // translations + per-pixel phase ramps
    std::vector<cf> tra((size_t)N_TRA * P);
    for (int t = 0; t < N_TRA; t++) {
        float tx = 3.f * nrm(rng), ty = 3.f * nrm(rng);
        for (int p = 0; p < P; p++) {
            float ph = -2.f * float(M_PI) * (col[p] * tx + row[p] * ty) / N;
            tra[(size_t)t * P + p] = cf(std::cos(ph), std::sin(ph));
        }
    }

    // images, CTF, sigma reciprocal (pixel-major like allocPreCal
    // src/Optimiser.cpp:8043)
    std::vector<cf> dat((size_t)N_IMG * P);
    std::vector<float> ctf((size_t)N_IMG * P), srcp((size_t)N_IMG * P);
    for (auto& v : dat) v = cf(nrm(rng), nrm(rng));
    for (auto& v : ctf) v = 2.f * uni(rng) - 1.f;
    for (auto& v : srcp) v = -0.5f / (0.5f + 1.5f * uni(rng));

    std::vector<float> logL((size_t)N_IMG);
    std::vector<cf> pri(P);
    std::vector<cf> F((size_t)M * M * M);
    std::vector<float> T((size_t)M * M * M);
    double sink = 0;

    auto t0 = std::chrono::steady_clock::now();

    if (full) {
        // ---- full local-search iteration (src/Optimiser.cpp:1138-1660):
        // N_PHASE phases of per-image support projection + particle-filter
        // likelihood, then an M_RECO-pose insert per image
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic) firstprivate(pri) reduction(+:sink)
#endif
        for (int l = 0; l < N_IMG; l++) {
            const cf* d = &dat[(size_t)l * P];
            const float* c = &ctf[(size_t)l * P];
            const float* s = &srcp[(size_t)l * P];
            for (int ph = 0; ph < N_PHASE; ph++) {
                for (int r = 0; r < M_L_R; r++) {
                    const Mat3& R = rot[(size_t)(l * M_L_R + r + ph) % N_ROT];
                    for (int p = 0; p < P; p++) {
                        float hx = col[p] * PF, hy = row[p] * PF;
                        float x = R.m[0] * hx + R.m[1] * hy;
                        float y = R.m[3] * hx + R.m[4] * hy;
                        float z = R.m[6] * hx + R.m[7] * hy;
                        pri[p] = trilinear(vol, z, y, x);
                    }
                    for (int t = 0; t < M_L_T; t++) {
                        const cf* tr = &tra[(size_t)(t % N_TRA) * P];
                        float acc = 0.f;
                        for (int p = 0; p < P; p++) {
                            cf prj = c[p] * tr[p] * pri[p];
                            float dr = d[p].real() - prj.real();
                            float di = d[p].imag() - prj.imag();
                            acc += (dr * dr + di * di) * s[p];
                        }
                        sink += acc;
                    }
                }
            }
        }
        auto tb = std::chrono::steady_clock::now();

        for (int l = 0; l < N_IMG; l++) {
            const cf* d = &dat[(size_t)l * P];
            const float* c = &ctf[(size_t)l * P];
            for (int sdraw = 0; sdraw < M_RECO; sdraw++) {
                const Mat3& R = rot[(size_t)(l * M_RECO + sdraw) % N_ROT];
                for (int p = 0; p < P_U; p++) {
                    float hx = col_u[p] * PF, hy = row_u[p] * PF;
                    float x = R.m[0] * hx + R.m[1] * hy;
                    float y = R.m[3] * hx + R.m[4] * hy;
                    float z = R.m[6] * hx + R.m[7] * hy;
                    // d/c indexed mod the search ring: the harness has no
                    // rU-band image buffers; values don't affect cost
                    cf fv = (1.f / M_RECO) * c[p % P] * d[p % P];
                    float tv = (1.f / M_RECO) * c[p % P] * c[p % P];
                    scatter(F, T, z, y, x, fv, tv);
                    scatter(F, T, -z, -y, -x, std::conj(fv), tv);
                }
            }
        }
        auto tc = std::chrono::steady_clock::now();
        double dt_b = std::chrono::duration<double>(tb - t0).count();
        double dt_i = std::chrono::duration<double>(tc - tb).count();
        double dt = dt_b + dt_i;
        int threads = 1;
#ifdef _OPENMP
        threads = omp_get_max_threads();
#endif
        double pps = N_IMG / dt;
        std::printf(
            "{\"mode\": \"full_local_iteration\", \"pixels\": %d, "
            "\"threads\": %d, \"n_phase\": %d, \"m_l_r\": %d, \"m_l_t\": %d, "
            "\"m_reco\": %d, \"t_phaseB_s\": %.3f, \"t_insert_s\": %.3f, "
            "\"particles_per_sec\": %.3f, "
            "\"particles_per_sec_per_core\": %.3f, \"sink\": %.3g}\n",
            P, threads, N_PHASE, M_L_R, M_L_T, M_RECO, dt_b, dt_i, pps,
            pps / threads, sink + std::abs(F[0]));
        return 0;
    }

    // ---- phase A: rotations x translations x images x pixels
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic) firstprivate(pri) reduction(+:sink)
#endif
    for (int m = 0; m < N_ROT; m++) {
        const Mat3& R = rot[m];
        for (int p = 0; p < P; p++) {
            float hx = col[p] * PF, hy = row[p] * PF;
            float x = R.m[0] * hx + R.m[1] * hy;
            float y = R.m[3] * hx + R.m[4] * hy;
            float z = R.m[6] * hx + R.m[7] * hy;
            pri[p] = trilinear(vol, z, y, x);
        }
        for (int t = 0; t < N_TRA; t++) {
            const cf* tr = &tra[(size_t)t * P];
            for (int l = 0; l < N_IMG; l++) {
                const cf* d = &dat[(size_t)l * P];
                const float* c = &ctf[(size_t)l * P];
                const float* s = &srcp[(size_t)l * P];
                float acc = 0.f;
                for (int p = 0; p < P; p++) {
                    cf prj = c[p] * tr[p] * pri[p];
                    float dr = d[p].real() - prj.real();
                    float di = d[p].imag() - prj.imag();
                    acc += (dr * dr + di * di) * s[p];
                }
                sink += acc;
            }
        }
    }
    auto t1 = std::chrono::steady_clock::now();

    // ---- insert: one pose per image (src/Reconstructor.cpp:569-928)
    for (int l = 0; l < N_IMG; l++) {
        const Mat3& R = rot[l % N_ROT];
        const cf* d = &dat[(size_t)l * P];
        const float* c = &ctf[(size_t)l * P];
        for (int p = 0; p < P; p++) {
            float hx = col[p] * PF, hy = row[p] * PF;
            float x = R.m[0] * hx + R.m[1] * hy;
            float y = R.m[3] * hx + R.m[4] * hy;
            float z = R.m[6] * hx + R.m[7] * hy;
            cf fv = c[p] * d[p];
            float tv = c[p] * c[p];
            scatter(F, T, z, y, x, fv, tv);
            scatter(F, T, -z, -y, -x, std::conj(fv), tv);
        }
    }
    auto t2 = std::chrono::steady_clock::now();

    double dt_e = std::chrono::duration<double>(t1 - t0).count();
    double dt_i = std::chrono::duration<double>(t2 - t1).count();
    double dt = dt_e + dt_i;
    int threads = 1;
#ifdef _OPENMP
    threads = omp_get_max_threads();
#endif
    double pps = N_IMG / dt;
    std::printf(
        "{\"pixels\": %d, \"threads\": %d, \"t_estep_s\": %.3f, "
        "\"t_insert_s\": %.3f, \"particles_per_sec\": %.3f, "
        "\"particles_per_sec_per_core\": %.3f, \"sink\": %.3g}\n",
        P, threads, dt_e, dt_i, pps, pps / threads, sink + std::abs(F[0]));
    return 0;
}
