// Native C++ deployment build of the 6-state optimal-NPI EKF/EKS.
//
// This is the framework's answer to the reference's MATLAB Coder C++ codegen
// project (MatlabCodeGenerator/NewCaseEKFEstimatorWithOptimalNPI.prj,
// SURVEY.md 2.9): a dependency-free C++17 implementation of the
// pre-generic estimator semantics (Tools/NewCaseEKFEstimatorWithOptimalNPI.m
// — simple covariance update, no symmetrization, Gaussian-elimination
// smoother gain, R adapted on every valid step) exposed through a C ABI for
// standalone serving without Python/JAX. The JAX path remains the TPU
// compute path; this is the portable CPU deployment artifact, pinned against
// the JAX implementation by tests/test_deploy.py.
//
// Layouts: time-major row-major. u: T x P; x: T; outputs T x 6 / T x P.

#include <atomic>
#include <cmath>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int M = 6;  // state dim

struct Mat6 {
    double a[M][M];
    void zero() { std::memset(a, 0, sizeof(a)); }
    void eye() {
        zero();
        for (int i = 0; i < M; ++i) a[i][i] = 1.0;
    }
};

inline void matmul(const Mat6& A, const Mat6& B, Mat6& C) {
    for (int i = 0; i < M; ++i)
        for (int k = 0; k < M; ++k) {
            double s = 0.0;
            for (int j = 0; j < M; ++j) s += A.a[i][j] * B.a[j][k];
            C.a[i][k] = s;
        }
}

inline void matmul_T(const Mat6& A, const Mat6& B, Mat6& C) {  // A * B^T
    for (int i = 0; i < M; ++i)
        for (int k = 0; k < M; ++k) {
            double s = 0.0;
            for (int j = 0; j < M; ++j) s += A.a[i][j] * B.a[k][j];
            C.a[i][k] = s;
        }
}

// Solve X * A = B  (MATLAB B/A) via Gaussian elimination with partial
// pivoting on A^T X^T = B^T.
inline void mrdivide(const Mat6& B, const Mat6& A, Mat6& X) {
    double aug[M][2 * M];
    for (int i = 0; i < M; ++i) {
        for (int j = 0; j < M; ++j) {
            aug[i][j] = A.a[j][i];        // A^T
            aug[i][M + j] = B.a[j][i];    // B^T columns as RHS
        }
    }
    for (int col = 0; col < M; ++col) {
        int piv = col;
        for (int r = col + 1; r < M; ++r)
            if (std::fabs(aug[r][col]) > std::fabs(aug[piv][col])) piv = r;
        if (piv != col)
            for (int j = 0; j < 2 * M; ++j) std::swap(aug[col][j], aug[piv][j]);
        double d = aug[col][col];
        if (d == 0.0) d = 1e-300;
        for (int j = 0; j < 2 * M; ++j) aug[col][j] /= d;
        for (int r = 0; r < M; ++r) {
            if (r == col) continue;
            double f = aug[r][col];
            if (f != 0.0)
                for (int j = 0; j < 2 * M; ++j) aug[r][j] -= f * aug[col][j];
        }
    }
    for (int i = 0; i < M; ++i)
        for (int j = 0; j < M; ++j) X.a[j][i] = aug[i][M + j];  // (X^T)^T
}

inline double clip(double v, double lo, double hi) {
    // MATLAB max(lo, min(hi, v)) NaN semantics: NaN -> hi branch first
    double t = (v < hi) ? v : hi;      // min(hi, v): NaN -> hi
    if (std::isnan(v)) t = hi;
    double r = (t > lo) ? t : lo;      // max(lo, .)
    return r;
}

struct Params {
    double dt, beta, gamma, b, epsilon, sigma, alpha_min, alpha_max;
    const double* a;      // P
    const double* u_min;  // P
    const double* u_max;  // P
    const double* w;      // P
    int P;
};

// Bang-bang fill + state update (SIAlphaModelEKFOptControlled.m:39-74)
inline void state_update(const double* u_in, const double* s, const Params& p,
                         double* u_out, double* s_next) {
    const double dt = p.dt;
    double drive_u = 0.0;
    for (int k = 0; k < p.P; ++k) {
        double uk = u_in[k];
        if (std::isnan(uk)) {
            double phi = p.epsilon * p.w[k] - p.gamma * s[5] * p.a[k];
            uk = (phi > 0.0) ? p.u_min[k] : p.u_max[k];
        }
        u_out[k] = uk;
        drive_u += p.a[k] * (p.u_max[k] - uk);
    }
    double rho = s[3] - s[4] - (1.0 - p.epsilon);
    s_next[0] = clip(s[0] - dt * s[2] * s[0] * s[1], 0.0, 1.0);
    s_next[1] = clip(s[1] + dt * (s[2] * s[0] * s[1] - p.beta * s[1]),
                     0.0, 1.0);
    s_next[2] = clip(s[2] + dt * (-p.gamma * s[2] + p.gamma * p.b
                                  + p.gamma * drive_u),
                     p.alpha_min, p.alpha_max);
    s_next[3] = s[3] + dt * rho * s[2] * s[1];
    s_next[4] = s[4] + dt * (rho * s[2] * s[0] + p.beta * s[4]);
    s_next[5] = s[5] + dt * (rho * s[0] * s[1] + p.gamma * s[5]);
}

inline void state_jacobian(const double* u_in, const double* s,
                           const Params& p, Mat6& A) {
    const double dt = p.dt;
    A.zero();
    A.a[0][0] = 1.0 - dt * s[2] * s[1];
    A.a[0][1] = -dt * s[2] * s[0];
    A.a[0][2] = -dt * s[0] * s[1];
    A.a[1][0] = dt * s[1] * s[2];
    A.a[1][1] = 1.0 + dt * (s[0] * s[2] - p.beta);
    A.a[1][2] = dt * s[0] * s[1];
    A.a[2][2] = 1.0 - dt * p.gamma;
    double a36 = 0.0;
    for (int k = 0; k < p.P; ++k) {
        if (std::isnan(u_in[k])) {
            double phi = p.epsilon * p.w[k] - p.gamma * s[5] * p.a[k];
            if (phi > -1.0 / p.sigma && phi < 1.0 / p.sigma)
                a36 -= p.gamma * dt * (p.sigma / 2.0) * p.a[k]
                       * (p.u_max[k] - p.u_min[k]);
        }
    }
    A.a[2][5] = a36;
    double rho = s[3] - s[4] - (1.0 - p.epsilon);
    A.a[3][1] = dt * s[2] * rho;
    A.a[3][2] = dt * s[1] * rho;
    A.a[3][3] = 1.0 + dt * s[1] * s[2];
    A.a[3][4] = -dt * s[1] * s[2];
    A.a[4][0] = dt * s[2] * rho;
    A.a[4][2] = dt * s[0] * rho;
    A.a[4][3] = dt * s[0] * s[2];
    A.a[4][4] = 1.0 - dt * (s[0] * s[2] - p.beta);
    A.a[5][0] = dt * s[1] * rho;
    A.a[5][1] = dt * s[0] * rho;
    A.a[5][3] = dt * s[0] * s[1];
    A.a[5][4] = -dt * s[0] * s[1];
    A.a[5][5] = 1.0 + dt * p.gamma;
}

inline void hard_margins(double* s, const Params& p) {
    // min(1, max(0, .)) — NaN -> 0 branch (clip_hi_lo order)
    for (int i = 0; i < 2; ++i) {
        double v = (s[i] > 0.0) ? s[i] : 0.0;   // max(0, v): NaN -> 0
        if (std::isnan(s[i])) v = 0.0;
        s[i] = (v < 1.0) ? v : 1.0;
    }
    double v = (s[2] > p.alpha_min) ? s[2] : p.alpha_min;
    if (std::isnan(s[2])) v = p.alpha_min;
    s[2] = (v < p.alpha_max) ? v : p.alpha_max;
}

}  // namespace

extern "C" {

// Returns 0 on success.
int newcase_ekf_optimal_npi(
    const double* u, const double* x, int T, int P,
    double dt, double beta_model, double gamma_model, double b_coef,
    double epsilon, double sigma, double alpha_min, double alpha_max,
    const double* a_coef, const double* u_min, const double* u_max,
    const double* w,
    const double* s_init, const double* Ps_init,
    const double* s_final, const double* Ps_final,
    const double* Q_in, const double* R_v,
    double beta_ekf, double gamma_ekf, int inv_monitor_len,
    double* S_PLUS_out, double* S_SMOOTH_out, double* U_OPT_SMOOTH_out) {
    Params p{dt, beta_model, gamma_model, b_coef, epsilon, sigma,
             alpha_min, alpha_max, a_coef, u_min, u_max, w, P};

    std::vector<double> S_MINUS(T * M), S_PLUS(T * M);
    std::vector<Mat6> P_MINUS(T), P_PLUS(T);
    Mat6 Q;
    std::memcpy(Q.a, Q_in, sizeof(double) * M * M);

    double sk_minus[M];
    std::memcpy(sk_minus, s_init, sizeof(sk_minus));
    Mat6 Pk_minus;
    std::memcpy(Pk_minus.a, Ps_init, sizeof(double) * M * M);

    std::vector<double> inn_buf(inv_monitor_len, 0.0);
    std::vector<double> cov_buf(inv_monitor_len, 0.0);
    double R = R_v[0];
    bool adaptive = (beta_ekf != 1.0);

    for (int t = 0; t < T; ++t) {
        if (!adaptive) R = R_v[t];
        std::memcpy(&S_MINUS[t * M], sk_minus, sizeof(sk_minus));
        P_MINUS[t] = Pk_minus;

        // observation: x = s*i*alpha, C = d(obs)/ds
        double C[M] = {sk_minus[1] * sk_minus[2], sk_minus[0] * sk_minus[2],
                       sk_minus[0] * sk_minus[1], 0, 0, 0};
        double x_pred = sk_minus[0] * sk_minus[1] * sk_minus[2];
        if (x_pred < 0.0 || std::isnan(x_pred)) x_pred = 0.0;  // obs margin

        double K[M] = {0, 0, 0, 0, 0, 0};
        double sk_plus[M];
        Mat6 Pk_plus;
        bool valid = !std::isnan(x[t]);
        if (valid) {
            double PCt[M];
            for (int i = 0; i < M; ++i) {
                double s = 0.0;
                for (int j = 0; j < M; ++j) s += Pk_minus.a[i][j] * C[j];
                PCt[i] = s;
            }
            double S = gamma_ekf * R;
            for (int i = 0; i < M; ++i) S += C[i] * PCt[i];
            double innov = x[t] - x_pred;
            for (int i = 0; i < M; ++i) K[i] = PCt[i] / S;
            // Pk_plus = (I - K C) Pk_minus / gamma  (simple form, :58)
            for (int i = 0; i < M; ++i)
                for (int j = 0; j < M; ++j) {
                    double ikc = 0.0;
                    for (int k2 = 0; k2 < M; ++k2) {
                        double v = ((i == k2) ? 1.0 : 0.0) - K[i] * C[k2];
                        ikc += v * Pk_minus.a[k2][j];
                    }
                    Pk_plus.a[i][j] = ikc / gamma_ekf;
                }
            for (int i = 0; i < M; ++i)
                sk_plus[i] = sk_minus[i] + K[i] * innov;
            // innovation monitor + adaptive R
            int cnt = (t + 1 < inv_monitor_len) ? (t + 1) : inv_monitor_len;
            for (int j = inv_monitor_len - 1; j > 0; --j)
                inn_buf[j] = inn_buf[j - 1];
            inn_buf[0] = innov;
            double mu = 0.0;
            for (int j = 0; j < inv_monitor_len; ++j) mu += inn_buf[j];
            mu /= cnt;
            double cc = (innov - mu) * (innov - mu);
            for (int j = inv_monitor_len - 1; j > 0; --j)
                cov_buf[j] = cov_buf[j - 1];
            cov_buf[0] = cc;
            if (adaptive) {
                double rest = 0.0;
                for (int j = 0; j < inv_monitor_len; ++j) rest += cov_buf[j];
                rest /= cnt;
                R = beta_ekf * R + (1.0 - beta_ekf) * rest;
            }
        } else {
            Pk_plus = Pk_minus;
            std::memcpy(sk_plus, sk_minus, sizeof(sk_plus));
            for (int j = inv_monitor_len - 1; j > 0; --j) {
                inn_buf[j] = inn_buf[j - 1];
                cov_buf[j] = cov_buf[j - 1];
            }
            inn_buf[0] = 0.0;
            int cnt = (t + 1 < inv_monitor_len) ? (t + 1) : inv_monitor_len;
            double mu = 0.0;
            for (int j = 0; j < inv_monitor_len; ++j) mu += inn_buf[j];
            mu /= cnt;
            cov_buf[0] = mu * mu;
        }
        hard_margins(sk_plus, p);

        // prediction
        double u_opt[64];
        state_update(&u[t * P], sk_plus, p, u_opt, sk_minus);
        Mat6 A, tmp;
        state_jacobian(&u[t * P], sk_plus, p, A);
        matmul(A, Pk_plus, tmp);
        matmul_T(tmp, A, Pk_minus);
        for (int i = 0; i < M; ++i)
            for (int j = 0; j < M; ++j) Pk_minus.a[i][j] += Q.a[i][j];
        hard_margins(sk_minus, p);

        std::memcpy(&S_PLUS[t * M], sk_plus, sizeof(sk_plus));
        P_PLUS[t] = Pk_plus;
    }

    // backward smoother (NewCaseEKFEstimatorWithOptimalNPI.m:117-139)
    std::vector<double> S_SMOOTH(T * M);
    std::vector<Mat6> P_SMOOTH(T);
    for (int i = 0; i < M; ++i) {
        double v = S_PLUS[(T - 1) * M + i];
        if (!std::isnan(s_final[i])) v = s_final[i];
        S_SMOOTH[(T - 1) * M + i] = v;
    }
    P_SMOOTH[T - 1] = P_PLUS[T - 1];
    for (int i = 0; i < M; ++i)
        for (int j = 0; j < M; ++j)
            if (!std::isnan(Ps_final[i * M + j]))
                P_SMOOTH[T - 1].a[i][j] = Ps_final[i * M + j];

    std::vector<double> U_SM(T * P, 0.0);
    for (int t = T - 2; t >= 0; --t) {
        Mat6 A, PAt, J, tmp;
        state_jacobian(&u[t * P], &S_PLUS[t * M], p, A);
        matmul_T(P_PLUS[t], A, PAt);
        mrdivide(PAt, P_MINUS[t + 1], J);
        double diff[M];
        for (int i = 0; i < M; ++i)
            diff[i] = S_SMOOTH[(t + 1) * M + i] - S_MINUS[(t + 1) * M + i];
        double s_sm[M];
        for (int i = 0; i < M; ++i) {
            double s = S_PLUS[t * M + i];
            for (int j = 0; j < M; ++j) s += J.a[i][j] * diff[j];
            s_sm[i] = s;
        }
        hard_margins(s_sm, p);
        std::memcpy(&S_SMOOTH[t * M], s_sm, sizeof(s_sm));
        Mat6 Pd;
        for (int i = 0; i < M; ++i)
            for (int j = 0; j < M; ++j)
                Pd.a[i][j] = P_MINUS[t + 1].a[i][j] - P_SMOOTH[t + 1].a[i][j];
        matmul(J, Pd, tmp);
        matmul_T(tmp, J, Pd);
        for (int i = 0; i < M; ++i)
            for (int j = 0; j < M; ++j)
                P_SMOOTH[t].a[i][j] = P_PLUS[t].a[i][j] - Pd.a[i][j];
        double s_next_dummy[M];
        state_update(&u[t * P], s_sm, p, &U_SM[t * P], s_next_dummy);
    }

    std::memcpy(S_PLUS_out, S_PLUS.data(), sizeof(double) * T * M);
    std::memcpy(S_SMOOTH_out, S_SMOOTH.data(), sizeof(double) * T * M);
    std::memcpy(U_OPT_SMOOTH_out, U_SM.data(), sizeof(double) * T * P);
    return 0;
}

// Full Pareto epsilon sweep for ONE region, threaded across epsilon values
// (the serving-side equivalent of testScripts/testPrescribeXPRIZE01.m
// :160-240: per epsilon run the opt-controlled EKF/EKS, re-simulate the
// horizon with SIalpha_Controlled from the historic endpoint, score with
// NPICost). sia_hist: T_hist x 3 historic (s, i, alpha) trajectory;
// the prescribed window is rows T_hist..T-1 of u (NaN on input).
// Outputs: U_OPT_SMOOTH_out (n_eps x T x P), J0_out/J1_out (n_eps).
int newcase_ekf_pareto_sweep(
    const double* u, const double* x, int T, int P, int T_hist,
    double dt, double beta_model, double gamma_model, double b_coef,
    double sigma, double alpha_min, double alpha_max,
    const double* eps_values, int n_eps,
    const double* a_coef, const double* u_min, const double* u_max,
    const double* w,
    const double* s_init, const double* Ps_init,
    const double* s_final, const double* Ps_final,
    const double* Q_in, const double* R_v,
    double beta_ekf, double gamma_ekf, int inv_monitor_len,
    const double* sia_hist, int n_threads,
    double* U_OPT_SMOOTH_out, double* J0_out, double* J1_out) {
    if (T_hist < 1 || T_hist > T) return 1;
    const int H = T - T_hist;
    if (n_threads <= 0) {
        n_threads = (int)std::thread::hardware_concurrency();
        if (n_threads <= 0) n_threads = 1;
    }
    if (n_threads > n_eps) n_threads = n_eps;

    std::atomic<int> next_idx{0};
    std::atomic<int> status{0};

    auto worker = [&]() {
        std::vector<double> S_PLUS(T * M), S_SMOOTH(T * M);
        for (;;) {
            int ll = next_idx.fetch_add(1);
            if (ll >= n_eps) break;
            double* u_out = U_OPT_SMOOTH_out + (size_t)ll * T * P;
            int rc = newcase_ekf_optimal_npi(
                u, x, T, P, dt, beta_model, gamma_model, b_coef,
                eps_values[ll], sigma, alpha_min, alpha_max,
                a_coef, u_min, u_max, w, s_init, Ps_init, s_final,
                Ps_final, Q_in, R_v, beta_ekf, gamma_ekf,
                inv_monitor_len, S_PLUS.data(), S_SMOOTH.data(), u_out);
            if (rc != 0) { status.store(rc); continue; }

            // re-simulate the horizon (SIalpha_Controlled semantics:
            // noise-free Euler, outputs drop the initial condition) from
            // the historic endpoint under the prescribed inputs
            Params p{dt, beta_model, gamma_model, b_coef, eps_values[ll],
                     sigma, alpha_min, alpha_max, a_coef, u_min, u_max, w,
                     P};
            double sc = sia_hist[(T_hist - 1) * 3 + 0];
            double ic = sia_hist[(T_hist - 1) * 3 + 1];
            double al = sia_hist[(T_hist - 1) * 3 + 2];
            double sum_cases = 0.0;
            for (int t = 0; t < T_hist; ++t)
                sum_cases += sia_hist[t * 3 + 0] * sia_hist[t * 3 + 1]
                             * sia_hist[t * 3 + 2];
            for (int t = 0; t < H; ++t) {
                const double* u_t = u_out + (size_t)(T_hist + t) * P;
                double drive_u = 0.0;
                for (int k = 0; k < P; ++k)
                    drive_u += a_coef[k] * (u_max[k] - u_t[k]);
                double s1 = clip(sc - dt * al * sc * ic, 0.0, 1.0);
                double i1 = clip(ic + dt * (al * sc * ic - beta_model * ic),
                                 0.0, 1.0);
                double a1 = clip(al + dt * (-gamma_model * al
                                            + gamma_model * b_coef
                                            + gamma_model * drive_u),
                                 alpha_min, alpha_max);
                sc = s1; ic = i1; al = a1;
                sum_cases += sc * ic * al;
            }
            // NPICost (Tools/NPICost.m:5-10): J0 = mean(newcases),
            // J1 = mean over all (npi, day) entries of weights .* inputs
            J0_out[ll] = sum_cases / (double)T;
            double sum_wu = 0.0;
            for (int t = 0; t < T; ++t)
                for (int k = 0; k < P; ++k)
                    sum_wu += w[k] * u_out[(size_t)t * P + k];
            J1_out[ll] = sum_wu / (double)(T * P);
        }
    };

    std::vector<std::thread> pool;
    pool.reserve(n_threads);
    for (int i = 0; i < n_threads; ++i) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
    return status.load();
}

}  // extern "C"
