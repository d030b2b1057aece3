// Native host-side components for pyc2ray-tpu, exposed via a C ABI and
// loaded from Python with ctypes (no pybind11 dependency).
//
// Components:
//  1. build_geometry_tables: octahedral traversal table builder — the
//     host-side "graph builder" of the framework. Produces, for every
//     in-clip cell of the octahedron sorted by shell, the 4 interpolation
//     corner indices, geometric weights, path length, diagonal factor and
//     distance. Equivalent roles in the reference: the ASORA thread
//     mapping (src/asora/raytracing.cu:39-59) + cinterp geometry
//     (src/c2ray/raytracing.f90:576-815), here resolved once at setup.
//  2. oracle_sweep: sequential C2Ray cube-sweep raytracer (the
//     bit-accuracy oracle; mirrors src/c2ray/raytracing.f90:52-567).
//  3. chemistry_global: sequential per-cell chemistry pass
//     (mirrors src/c2ray/chemistry.f90:13-204).
//
// Build: make -C native   (produces libc2ray_native.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

static const double SQRT2 = 1.41421356237;
static const double SQRT3 = 1.73205080757;
static const double FOURPI = 12.566370614359172463991853874177;
static const double TAU_PHOTO_LIMIT = 1.0e-7;
static const double MAX_COLDENSH = 2.0e30;
static const double S_STAR_REF = 1.0e48;
static const double EPSILON = 1.0e-14;

static inline int imod(int a, int b) { return ((a % b) + b) % b; }
static inline int isign(int x) { return x >= 0 ? 1 : -1; }
static inline double weightf(double cd, double sig) {
    double w = cd * sig;
    return 1.0 / (w > 0.6 ? w : 0.6);
}

// ---------------------------------------------------------------------
// cinterp geometry for a single relative offset (source at origin).
// Outputs corner offsets (4x3), geometric weights s[4], path, diag.
// ---------------------------------------------------------------------
static void corner_geometry(int di, int dj, int dk, int corners[4][3],
                            double s[4], double* path, double* diag) {
    int idela = std::abs(di), jdela = std::abs(dj), kdela = std::abs(dk);
    int sgni = isign(di), sgnj = isign(dj), sgnk = isign(dk);
    int im = di - sgni, jm = dj - sgnj, km = dk - sgnk;
    double fdi = di, fdj = dj, fdk = dk;
    double fim = im, fjm = jm, fkm = km;
    *diag = 1.0;

    if (kdela >= jdela && kdela >= idela) {  // z-plane crossing
        double alam = (fkm + sgnk * 0.5) / fdk;
        double xc = alam * fdi, yc = alam * fdj;
        double dx = 2.0 * std::fabs(xc - (fim + 0.5 * sgni));
        double dy = 2.0 * std::fabs(yc - (fjm + 0.5 * sgnj));
        s[0] = (1. - dx) * (1. - dy);
        s[1] = (1. - dy) * dx;
        s[2] = (1. - dx) * dy;
        s[3] = dx * dy;
        int ci[4] = {im, di, im, di}, cj[4] = {jm, jm, dj, dj};
        for (int c = 0; c < 4; c++) {
            corners[c][0] = ci[c]; corners[c][1] = cj[c]; corners[c][2] = km;
        }
        if (kdela == 1 && (idela == 1 || jdela == 1))
            *diag = (idela == 1 && jdela == 1) ? SQRT3 : SQRT2;
        *path = std::sqrt((fdi * fdi + fdj * fdj) / (fdk * fdk) + 1.0);
    } else if (jdela >= idela && jdela >= kdela) {  // y-plane crossing
        double alam = (fjm + sgnj * 0.5) / fdj;
        double zc = alam * fdk, xc = alam * fdi;
        double dz = 2.0 * std::fabs(zc - (fkm + 0.5 * sgnk));
        double dx = 2.0 * std::fabs(xc - (fim + 0.5 * sgni));
        s[0] = (1. - dx) * (1. - dz);
        s[1] = (1. - dz) * dx;
        s[2] = (1. - dx) * dz;
        s[3] = dx * dz;
        int ci[4] = {im, di, im, di}, ck[4] = {km, km, dk, dk};
        for (int c = 0; c < 4; c++) {
            corners[c][0] = ci[c]; corners[c][1] = jm; corners[c][2] = ck[c];
        }
        if (jdela == 1 && (idela == 1 || kdela == 1))
            *diag = (idela == 1 && kdela == 1) ? SQRT3 : SQRT2;
        *path = std::sqrt((fdi * fdi + fdk * fdk) / (fdj * fdj) + 1.0);
    } else {  // x-plane crossing
        double alam = (fim + sgni * 0.5) / fdi;
        double zc = alam * fdk, yc = alam * fdj;
        double dz = 2.0 * std::fabs(zc - (fkm + 0.5 * sgnk));
        double dy = 2.0 * std::fabs(yc - (fjm + 0.5 * sgnj));
        s[0] = (1. - dz) * (1. - dy);
        s[1] = (1. - dz) * dy;
        s[2] = (1. - dy) * dz;
        s[3] = dy * dz;
        int cj[4] = {jm, dj, jm, dj}, ck[4] = {km, km, dk, dk};
        for (int c = 0; c < 4; c++) {
            corners[c][0] = im; corners[c][1] = cj[c]; corners[c][2] = ck[c];
        }
        if (idela == 1 && (jdela == 1 || kdela == 1))
            *diag = (jdela == 1 && kdela == 1) ? SQRT3 : SQRT2;
        *path = std::sqrt(1.0 + (fdj * fdj + fdk * fdk) / (fdi * fdi));
    }
}

// ---------------------------------------------------------------------
// 1. Geometry table builder.
// Returns the number of cells C, or -1 on error. Caller passes buffers
// sized for the worst case (capacity); shell_start has max_q+2 entries.
// Enumeration order: cells sorted by shell q (stable in (di,dj,dk)
// lexicographic order over [lo,hi]^3), matching the numpy builder.
// ---------------------------------------------------------------------
int64_t build_geometry_tables(
    int32_t N, int32_t max_q,
    int64_t capacity,
    int32_t* offsets,      // (3, capacity)
    int32_t* nbr,          // (4, capacity)
    double* sw,            // (4, capacity)
    double* path,          // (capacity)
    double* diag,          // (capacity)
    double* dist2,         // (capacity)
    int32_t* shell_start,  // (max_q + 2)
    int32_t* shell_size)   // (max_q + 1)
{
    const int last_r = N / 2 - 1 + (N % 2);
    const int last_l = -(N / 2);
    const int lo = last_l > -max_q ? last_l : -max_q;
    const int hi = last_r < max_q ? last_r : max_q;
    const int side = hi - lo + 1;

    // count shell sizes
    for (int q = 0; q <= max_q; q++) shell_size[q] = 0;
    for (int di = lo; di <= hi; di++)
        for (int dj = lo; dj <= hi; dj++)
            for (int dk = lo; dk <= hi; dk++) {
                int q = std::abs(di) + std::abs(dj) + std::abs(dk);
                if (q <= max_q) shell_size[q]++;
            }
    shell_start[0] = 0;
    for (int q = 0; q <= max_q; q++)
        shell_start[q + 1] = shell_start[q] + shell_size[q];
    const int64_t C = shell_start[max_q + 1];
    if (C > capacity) return -1;

    // place cells (counting sort by q, stable)
    std::vector<int32_t> cursor(max_q + 1);
    for (int q = 0; q <= max_q; q++) cursor[q] = shell_start[q];
    std::vector<int32_t> inv((size_t)side * side * side, -1);
    for (int di = lo; di <= hi; di++)
        for (int dj = lo; dj <= hi; dj++)
            for (int dk = lo; dk <= hi; dk++) {
                int q = std::abs(di) + std::abs(dj) + std::abs(dk);
                if (q > max_q) continue;
                int32_t idx = cursor[q]++;
                offsets[0 * capacity + idx] = di;
                offsets[1 * capacity + idx] = dj;
                offsets[2 * capacity + idx] = dk;
                inv[((size_t)(di - lo) * side + (dj - lo)) * side + (dk - lo)]
                    = idx;
            }

    // per-cell geometry
    // cell 0 = source: path 0.5, no corners
    path[0] = 0.5; diag[0] = 1.0; dist2[0] = 0.0;
    for (int c = 0; c < 4; c++) { nbr[c * capacity] = 0; sw[c * capacity] = 0.0; }

    for (int64_t i = 1; i < C; i++) {
        int di = offsets[0 * capacity + i];
        int dj = offsets[1 * capacity + i];
        int dk = offsets[2 * capacity + i];
        int corners[4][3];
        double s[4], p, dg;
        corner_geometry(di, dj, dk, corners, s, &p, &dg);
        path[i] = p; diag[i] = dg;
        dist2[i] = (double)di * di + (double)dj * dj + (double)dk * dk;
        for (int c = 0; c < 4; c++) {
            int ci = corners[c][0], cj = corners[c][1], ck = corners[c][2];
            int32_t idx = 0;
            if (ci >= lo && ci <= hi && cj >= lo && cj <= hi && ck >= lo
                && ck <= hi) {
                int32_t found = inv[((size_t)(ci - lo) * side + (cj - lo))
                                    * side + (ck - lo)];
                if (found >= 0) idx = found;
                else if (s[c] != 0.0) return -2;  // invariant violation
            } else if (s[c] != 0.0) {
                return -2;
            }
            nbr[c * capacity + i] = idx;
            sw[c * capacity + i] = s[c];
        }
    }
    return C;
}

// ---------------------------------------------------------------------
// table lookup (photorates.f90:130-147)
// ---------------------------------------------------------------------
static double photo_lookup(const double* table, int num_tau, double tau,
                           double minlogtau, double dlogtau) {
    double logtau = std::log10(tau > 1.0e-20 ? tau : 1.0e-20);
    double real_i = 1.0 + (logtau - minlogtau) / dlogtau;
    if (real_i < 0.0) real_i = 0.0;
    if (real_i > (double)num_tau) real_i = (double)num_tau;
    int i0 = (int)real_i;
    int i1 = i0 + 1 < num_tau ? i0 + 1 : num_tau;
    double resid = real_i - (double)i0;
    return table[i0] + resid * (table[i1] - table[i0]);
}

// ---------------------------------------------------------------------
// 2. Sequential oracle sweep (full-range cube, all sources).
// grey != 0 -> analytic grey rates; otherwise thin/thick tables.
// Positions are 0-indexed (num_src x 3, row-major).
// ---------------------------------------------------------------------
void oracle_sweep(
    int32_t N, int32_t num_src,
    const int32_t* src_pos, const double* src_flux,
    const double* ndens, const double* xh_av,
    double dr, double sig, double r_max_lls,
    int32_t grey,
    const double* photo_thin, const double* photo_thick,
    const double* heat_thin, const double* heat_thick,
    int32_t num_tau, double minlogtau, double dlogtau,
    double* phi_ion, double* phi_heat, double* coldensh_scratch)
{
    const int64_t n3 = (int64_t)N * N * N;
    std::memset(phi_ion, 0, n3 * sizeof(double));
    std::memset(phi_heat, 0, n3 * sizeof(double));
    double* cdh = coldensh_scratch;
    const int last_r = N / 2 - 1 + (N % 2);
    const int last_l = -(N / 2);
    const double r2max = r_max_lls * r_max_lls;

    for (int ns = 0; ns < num_src; ns++) {
        int i0 = src_pos[3 * ns], j0 = src_pos[3 * ns + 1],
            k0 = src_pos[3 * ns + 2];
        double flux = src_flux[ns];
        std::memset(cdh, 0, n3 * sizeof(double));

        // sweep order: z up then down; per plane j up/down, i up/down
        std::vector<int> ks, js, is;
        for (int k = k0; k <= k0 + last_r; k++) ks.push_back(k);
        for (int k = k0 - 1; k >= k0 + last_l; k--) ks.push_back(k);
        for (int j = j0; j <= j0 + last_r; j++) js.push_back(j);
        for (int j = j0 - 1; j >= j0 + last_l; j--) js.push_back(j);
        for (int i = i0; i <= i0 + last_r; i++) is.push_back(i);
        for (int i = i0 - 1; i >= i0 + last_l; i--) is.push_back(i);

        for (int k : ks) for (int j : js) for (int i : is) {
            int pi = imod(i, N), pj = imod(j, N), pk = imod(k, N);
            int64_t lin = ((int64_t)pi * N + pj) * N + pk;
            if (cdh[lin] != 0.0) continue;
            double xh_p = xh_av[lin];
            double nHI = ndens[lin] * (1.0 - xh_p);
            double coldens_in, pathlen, vol_ph;
            bool stop_rt = false;
            if (i == i0 && j == j0 && k == k0) {
                coldens_in = 0.0;
                pathlen = 0.5 * dr;
                vol_ph = dr * dr * dr;
            } else {
                int corners[4][3];
                double s[4], p, dg;
                corner_geometry(i - i0, j - j0, k - k0, corners, s, &p, &dg);
                double wsum = 0.0, csum = 0.0;
                for (int c = 0; c < 4; c++) {
                    int ci = imod(corners[c][0] + i0, N);
                    int cj = imod(corners[c][1] + j0, N);
                    int ck = imod(corners[c][2] + k0, N);
                    double cd = cdh[((int64_t)ci * N + cj) * N + ck];
                    double w = s[c] * weightf(cd, sig);
                    wsum += w; csum += cd * w;
                }
                coldens_in = dg * csum / wsum;
                pathlen = p * dr;
                double xs = dr * (i - i0), ys = dr * (j - j0),
                       zs = dr * (k - k0);
                double d2 = xs * xs + ys * ys + zs * zs;
                vol_ph = d2 * pathlen * FOURPI;
                if (d2 / (dr * dr) > r2max) stop_rt = true;
                if (coldens_in > MAX_COLDENSH) stop_rt = true;
            }
            double cd_out = coldens_in + nHI * pathlen;
            cdh[lin] = cd_out;
            double phi_p = 0.0, heat_p = 0.0;
            if (!stop_rt) {
                double tau_in = coldens_in * sig, tau_out = cd_out * sig;
                if (grey) {
                    double prefact = flux * S_STAR_REF / vol_ph;
                    if (std::fabs(tau_out - tau_in) > TAU_PHOTO_LIMIT)
                        phi_p = prefact * (std::exp(-tau_in)
                                           - std::exp(-tau_out));
                    else
                        phi_p = prefact * (tau_out - tau_in)
                                * std::exp(-tau_in);
                } else {
                    double prefact = flux / vol_ph;
                    if (std::fabs(tau_out - tau_in) > TAU_PHOTO_LIMIT) {
                        phi_p = prefact *
                            (photo_lookup(photo_thick, num_tau, tau_in,
                                          minlogtau, dlogtau)
                             - photo_lookup(photo_thick, num_tau, tau_out,
                                            minlogtau, dlogtau));
                        heat_p = prefact *
                            (photo_lookup(heat_thick, num_tau, tau_in,
                                          minlogtau, dlogtau)
                             - photo_lookup(heat_thick, num_tau, tau_out,
                                            minlogtau, dlogtau));
                    } else {
                        double lt = photo_lookup(photo_thin, num_tau, tau_in,
                                                 minlogtau, dlogtau);
                        phi_p = prefact * (tau_out - tau_in) * lt;
                        heat_p = prefact * (tau_out - tau_in)
                            * photo_lookup(heat_thin, num_tau, tau_in,
                                           minlogtau, dlogtau);
                    }
                }
            }
            phi_ion[lin] += phi_p / nHI;
            phi_heat[lin] += heat_p / nHI;
        }
    }
}

// ---------------------------------------------------------------------
// 3. Sequential chemistry pass (chemistry.f90:13-204)
// ---------------------------------------------------------------------
int64_t chemistry_global(
    int64_t n, double dt,
    const double* ndens, const double* temp,
    const double* xh, double* xh_av, double* xh_intermed,
    const double* phi_ion,
    double bh00, double albpow, double colh0, double temph0, double abu_c)
{
    const double MFC = 1.0e-3, MFA = 1.0e-8;
    int64_t conv_flag = 0;
    for (int64_t i = 0; i < n; i++) {
        double xh0 = xh[i], xav = xh_av[i];
        double xav_entry = xav;
        double T = temp[i], nd = ndens[i], phi = phi_ion[i];
        double brech0 = bh00 * std::pow(T / 1e4, albpow);
        double acolh0 = colh0 * std::sqrt(T) * std::exp(-temph0 / T);
        double xi = xh_intermed[i];
        for (int nit = 0; nit < 400; nit++) {
            double de = nd * (xav + abu_c);
            double aih0 = phi + de * acolh0;
            double delth = aih0 + de * brech0;
            double eqxh = aih0 / delth;
            double deltht = delth * dt;
            double ee = std::exp(-deltht);
            double x_new = (xh0 - eqxh) * ee + eqxh;
            if (x_new < EPSILON) x_new = EPSILON;
            double avg_f = deltht < 1.0e-8 ? 1.0 : (1.0 - ee) / deltht;
            double xav_new = eqxh + (xh0 - eqxh) * avg_f;
            if (xav_new < EPSILON) xav_new = EPSILON;
            double prev = xav;
            xav = xav_new; xi = x_new;
            if (std::fabs((xav_new - prev) / (1.0 - xav_new)) < MFC
                || (1.0 - xav_new) < MFA)
                break;
        }
        double yh_entry = 1.0 - xav_entry;
        double delta = xav - xav_entry;
        if (std::fabs(delta) > MFC && std::fabs(delta / yh_entry) > MFC
            && yh_entry > MFA)
            conv_flag++;
        xh_av[i] = xav;
        xh_intermed[i] = xi;
    }
    return conv_flag;
}

}  // extern "C"
