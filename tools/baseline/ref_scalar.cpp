// Single-threaded scalar C++ port of the reference's LINES walk —
// LINES + INTENS/HALFWHM_C/HALFWHM_D + LSF_LORTZ/LSF_SDVOIGT with the
// Humlicek W4 and SD_Humlicek rational approximations
// (modm.f90:277-1290 semantics, double precision, one core).
//
// Purpose: a *measured* single-core denominator for bench.py's
// vs_baseline ratio (BENCH_NOTES.md).  The image has no Fortran
// compiler, so this -O3 scalar port — the same per-(wavenumber, line)
// cost structure as the Fortran: intensity, widths and the shape
// function recomputed per wavenumber inside the line loop, the
// +-25 cm^-1 window cut, the zeta Lorentz switch — stands in for the
// `linuxGNUdbl` build.  Correctness is pinned against the NumPy oracle
// tests/reference_lines.py (tests/test_cpp_baseline.py).
//
// Input: binary dump from tools/baseline/gen_input.py.  Output: one
// JSON line with the measured evals/s; with DUMP_OUT=1, also writes
// o_by_mol[nlay][nwn][39] for the correctness test.
//
// Build: g++ -O3 -std=c++17 -o ref_scalar ref_scalar.cpp -lm

#include <chrono>
#include <cmath>
#include <complex>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

using cdbl = std::complex<double>;
static const double DELTNUC = 25.0;
static const double TEMPLC[4] = {200.0, 250.0, 296.0, 340.0};
static const double SQL2 = 0.8325546111576977;  // sqrt(ln 2)

// physical constants (PhysConstants.f90:27-37 values)
static double RADCT, BOLTZ, AVOGAD, CLIGHT, T0;

// ---- Humlicek W4 (modm.f90:1100-1130) ------------------------------
static cdbl w4(double x, double y) {
  cdbl t(y, -x);
  double s = std::fabs(x) + y;
  if (s >= 15.0) return t * 0.5641896 / (0.5 + t * t);
  if (s >= 5.5) {
    cdbl u = t * t;
    return t * (1.410474 + u * 0.5641896) / (0.75 + u * (3.0 + u));
  }
  if (y >= 0.195 * std::fabs(x) - 0.176)
    return (16.4955 + t * (20.20933 + t * (11.96482 + t * (3.778987 + t * 0.5642236)))) /
           (16.4955 + t * (38.82363 + t * (39.27121 + t * (21.69274 + t * (6.699398 + t)))));
  cdbl u = t * t;
  return std::exp(u) - t * (36183.31 - u * (3321.9905 - u * (1540.787 - u * (219.0313 - u *
      (35.76683 - u * (1.320522 - u * 0.56419)))))) /
      (32066.6 - u * (24322.84 - u * (9022.228 - u * (2186.181 - u *
      (364.2191 - u * (61.57037 - u * (1.841439 - u)))))));
}

static double voigt_ref(double dnu, double al, double ad) {
  double zeta = al / (al + ad);
  if (zeta == 1.0) return al / (M_PI * (al * al + dnu * dnu));
  double x = SQL2 * dnu / ad, y = SQL2 * al / ad;
  return w4(x, y).real() * std::sqrt(std::log(2.0) / M_PI) / ad;
}

// ---- SD_Humlicek (modm.f90:1150-1251) ------------------------------
static int sd_region(double s, double x, double y) {
  if (s >= 15.0) return 1;
  if (s >= 6.0) return 2;
  if (y < 0.195 * std::fabs(x) - 0.176) return 4;
  return 3;
}

static cdbl w_formula(cdbl t, int region) {
  if (region == 1) return t * 0.5641896 / (0.5 + t * t);
  if (region == 2) {
    cdbl u = t * t;
    return t * (1.410474 + u * 0.5641896) / (0.75 + u * (3.0 + u));
  }
  if (region == 3)
    return (16.4955 + t * (20.20933 + t * (11.96482 + t * (3.778987 + t * 0.5642236)))) /
           (16.4955 + t * (38.82363 + t * (39.27121 + t * (21.69274 + t * (6.699398 + t)))));
  cdbl u = t * t;
  return std::exp(u) - t * (36183.31 - u * (3321.9905 - u * (1540.787 - u * (219.0313 - u *
      (35.76683 - u * (1.320522 - u * 0.56419)))))) /
      (32066.6 - u * (24322.84 - u * (9022.228 - u * (2186.181 - u *
      (364.2191 - u * (61.57037 - u * (1.841439 - u)))))));
}

static double sdvoigt_ref(double dnu, double al, double ad, double sdep) {
  if (std::fabs(sdep) <= 1e-4) return voigt_ref(dnu, al, ad);
  double gamma2 = al * sdep;
  double alfa = al / gamma2 - 1.5;
  double beta = dnu / gamma2;
  double delta = (0.25 / std::log(2.0)) * ad * ad / (gamma2 * gamma2);
  double ad_ = alfa + delta;
  double tmp = std::sqrt(ad_ * ad_ + beta * beta);
  double x1 = M_SQRT1_2 * std::sqrt(tmp + ad_) - std::sqrt(delta);
  double x2 = x1 + 2.0 * std::sqrt(delta);
  double sign = (beta > 0.0) - (beta < 0.0);
  double arg = (tmp - delta - alfa) / 2.0;
  double y1 = sign * std::sqrt(arg > 0.0 ? arg : 0.0);
  double y2 = y1;
  cdbl t1(x1, -y1), t2(x2, -y2);
  double s1 = std::fabs(y1) + x1, s2 = std::fabs(y2) + x2;
  int r1 = sd_region(s1, y1, x1), r2 = sd_region(s2, y2, x2);
  int r = r1 > r2 ? r1 : r2;
  cdbl w1, w2;
  if (r < 4) {
    w1 = w_formula(t1, r);
    w2 = w_formula(t2, r);
  } else {
    w1 = w_formula(t1, r1 == 4 ? 4 : 3);
    w2 = w_formula(t2, r2 == 4 ? 4 : 3);
  }
  return (w1 - w2).real() * std::sqrt(std::log(2.0) / M_PI) / ad;
}

static inline double xlorentz(double z) { return 1.0 / (M_PI * (1.0 + z * z)); }

// ---- LSF branch trees (modm.f90:567-831) ---------------------------
struct LsfArgs {
  double xf, rp, rp2, aip, bip, hwhm, wn, xnu, ad, sdep;
  int mol;
};

static double lsf_sdvoigt(const LsfArgs& a) {
  double diff = (a.wn + a.xnu) - DELTNUC;
  double sls = 0.0;
  auto K = [&](double d) { return sdvoigt_ref(d, a.hwhm, a.ad, a.sdep); };
  bool cpl = (a.xf == -1.0 || a.xf == -3.0 || a.xf == -5.0);
  double yc = a.aip / a.hwhm * a.rp;
  if (a.mol != 2 && a.mol != 7) {
    if (cpl) {
      double xl1 = K(a.wn - a.xnu), xl3 = K(DELTNUC);
      double y1 = 1.0 + yc * (a.wn - a.xnu) + a.bip * a.rp2;
      double y1p = 1.0 + yc * DELTNUC + a.bip * a.rp2;
      if (diff <= 0.0) {
        double xl2 = K(a.wn + a.xnu);
        double y2 = 1.0 - yc * (a.wn + a.xnu) + a.bip * a.rp2;
        double y2p = 1.0 - yc * DELTNUC + a.bip * a.rp2;
        sls = y1 * xl1 - y1p * xl3 + y2 * xl2 - y2p * xl3;
      } else {
        sls = y1 * xl1 - y1p * xl3;
      }
    } else {
      double xl1 = K(a.wn - a.xnu), xl3 = K(DELTNUC);
      sls = (diff <= 0.0) ? xl1 + K(a.wn + a.xnu) - 2.0 * xl3 : xl1 - xl3;
    }
  } else {
    if (std::fabs(a.wn - a.xnu) <= DELTNUC && !cpl) {
      double xl1 = K(a.wn - a.xnu);
      if (a.mol == 7) {
        sls = (diff <= 0.0) ? xl1 + K(a.wn + a.xnu) : xl1;
      } else {
        double ped = 2.0 - (a.wn - a.xnu) * (a.wn - a.xnu) / (DELTNUC * DELTNUC);
        sls = xl1 - K(DELTNUC) * ped;
      }
    } else if (a.mol == 7) {
      if (cpl) {
        double xl1 = K(a.wn - a.xnu), xl2 = K(a.wn + a.xnu);
        if (a.xf == -1.0) {
          double y1 = 1.0 + yc * (a.wn - a.xnu) + a.bip * a.rp2;
          double y2 = 1.0 - yc * (a.wn + a.xnu) + a.bip * a.rp2;
          sls = xl1 * y1 + xl2 * y2;
        } else {
          sls = xl1 + xl2;
        }
      }
    } else {  // CO2 far/coupled (modm.f90:659)
      double xl1 = K(a.wn - a.xnu), xl3 = K(DELTNUC);
      double ped = 2.0 - (a.wn - a.xnu) * (a.wn - a.xnu) / (DELTNUC * DELTNUC);
      double xp4 = xl3 * ped;
      if (a.xf == -1.0 || a.xf == -5.0) {
        double y1 = 1.0 + yc * (a.wn - a.xnu) + a.bip * a.rp2;
        sls = xl1 * y1 - xp4 - xl3 * ((y1 - 1.0) * ped);
      } else {
        sls = xl1 - xp4;
      }
    }
  }
  return sls;
}

static double lsf_lortz(const LsfArgs& a) {
  double diff = (a.wn + a.xnu) - DELTNUC;
  double sls = 0.0;
  auto XL = [&](double d) { return xlorentz(d / a.hwhm); };
  bool cpl = (a.xf == -1.0 || a.xf == -3.0 || a.xf == -5.0);
  double yc = a.aip / a.hwhm * a.rp;
  if (a.mol != 2 && a.mol != 7) {
    if (cpl) {
      double xl1 = XL(a.wn - a.xnu), xl3 = XL(DELTNUC);
      double y1 = 1.0 + yc * (a.wn - a.xnu) + a.bip * a.rp2;
      double y1p = 1.0 + yc * DELTNUC + a.bip * a.rp2;
      if (diff <= 0.0) {
        double xl2 = XL(a.wn + a.xnu);
        double y2 = 1.0 - yc * (a.wn + a.xnu) + a.bip * a.rp2;
        double y2p = 1.0 - yc * DELTNUC + a.bip * a.rp2;
        sls = (y1 * xl1 - y1p * xl3 + y2 * xl2 - y2p * xl3) / a.hwhm;
      } else {
        sls = (y1 * xl1 - y1p * xl3) / a.hwhm;
      }
    } else {
      double xl1 = XL(a.wn - a.xnu), xl3 = XL(DELTNUC);
      sls = (diff <= 0.0) ? (xl1 + XL(a.wn + a.xnu) - 2.0 * xl3) / a.hwhm
                          : (xl1 - xl3) / a.hwhm;
    }
  } else {
    if (std::fabs(a.wn - a.xnu) <= DELTNUC && !cpl) {
      double xl1 = XL(a.wn - a.xnu);
      if (a.mol == 7) {
        sls = (diff <= 0.0) ? (xl1 + XL(a.wn + a.xnu)) / a.hwhm
                            : xl1 / a.hwhm;
      } else {
        double ped = 2.0 - (a.wn - a.xnu) * (a.wn - a.xnu) / (DELTNUC * DELTNUC);
        sls = (xl1 - XL(DELTNUC) * ped) / a.hwhm;
      }
    } else if (a.mol == 7) {
      if (cpl) {
        double xl1 = XL(a.wn - a.xnu), xl2 = XL(a.wn + a.xnu);
        if (a.xf == -1.0) {
          double y1 = 1.0 + yc * (a.wn - a.xnu) + a.bip * a.rp2;
          double y2 = 1.0 - yc * (a.wn + a.xnu) + a.bip * a.rp2;
          sls = (xl1 * y1 + xl2 * y2) / a.hwhm;
        } else {
          sls = (xl1 + xl2) / a.hwhm;
        }
      }
    } else if (cpl) {
      double xl1 = XL(a.wn - a.xnu), xl3 = XL(DELTNUC);
      double ped = 2.0 - (a.wn - a.xnu) * (a.wn - a.xnu) / (DELTNUC * DELTNUC);
      double xp4 = xl3 * ped;
      if (a.xf == -1.0 || a.xf == -5.0) {
        double y1 = 1.0 + yc * (a.wn - a.xnu) + a.bip * a.rp2;
        sls = (xl1 * y1 - xp4 - xl3 * ((y1 - 1.0) * ped)) / a.hwhm;
      } else {
        sls = (xl1 - xp4) / a.hwhm;
      }
    }
  }
  return sls;
}

// ---- input container -----------------------------------------------
struct Input {
  int64_t nwn, nlay, lmax;
  int64_t nblm[39];
  // [39][lmax] line fields
  std::vector<double> xnu0, s0, alpf, alps, e, x, deltnu, xg, iso, rmol, sdep;
  std::vector<double> wn, p, t, wk, wbrod, scor, smass;
};

static void rd(FILE* f, void* dst, size_t n) {
  if (std::fread(dst, 1, n, f) != n) { std::fprintf(stderr, "short read\n"); std::exit(1); }
}

static std::vector<double> rdvec(FILE* f, size_t n) {
  std::vector<double> v(n);
  rd(f, v.data(), n * sizeof(double));
  return v;
}

int main(int argc, char** argv) {
  if (argc < 2) { std::fprintf(stderr, "usage: ref_scalar input.bin [out.bin]\n"); return 1; }
  FILE* f = std::fopen(argv[1], "rb");
  if (!f) { std::perror("open"); return 1; }
  Input in;
  double consts[5];
  rd(f, consts, sizeof(consts));
  RADCT = consts[0]; BOLTZ = consts[1]; AVOGAD = consts[2];
  CLIGHT = consts[3]; T0 = consts[4];
  rd(f, &in.nwn, 8); rd(f, &in.nlay, 8); rd(f, &in.lmax, 8);
  rd(f, in.nblm, 39 * 8);
  size_t L = size_t(39) * in.lmax;
  in.xnu0 = rdvec(f, L); in.s0 = rdvec(f, L); in.alpf = rdvec(f, L);
  in.alps = rdvec(f, L); in.e = rdvec(f, L); in.x = rdvec(f, L);
  in.deltnu = rdvec(f, L); in.xg = rdvec(f, L); in.iso = rdvec(f, L);
  in.rmol = rdvec(f, L); in.sdep = rdvec(f, L);
  in.wn = rdvec(f, in.nwn);
  in.p = rdvec(f, in.nlay); in.t = rdvec(f, in.nlay);
  in.wk = rdvec(f, size_t(in.nlay) * 39);
  in.wbrod = rdvec(f, in.nlay);
  in.scor = rdvec(f, size_t(in.nlay) * 39 * 9);
  in.smass = rdvec(f, 39 * 9);
  std::fclose(f);

  bool dump = argc > 2;
  std::vector<double> out;
  if (dump) out.assign(size_t(in.nlay) * in.nwn * 39, 0.0);

  int64_t total_lines = 0;
  for (int i = 0; i < 39; ++i) total_lines += in.nblm[i];

  auto t0c = std::chrono::steady_clock::now();
  double checksum = 0.0;
  const double xn0 = (1013.25 / (BOLTZ * T0)) * 1e3;

  for (int64_t k = 0; k < in.nlay; ++k) {
    const double p = in.p[k], t = in.t[k];
    const double* wk = &in.wk[k * 39];
    const double* scor = &in.scor[k * 39 * 9];
    double wtot = in.wbrod[k];
    for (int m = 0; m < 39; ++m) wtot += wk[m];
    double rp = p / 1013.25, rp2 = rp * rp;
    int ilc = 3;
    for (int il = 1; il < 4; ++il)
      if (t < TEMPLC[il]) { ilc = il; break; }
    double rectlc = 1.0 / (TEMPLC[ilc] - TEMPLC[ilc - 1]);
    double tmpdif = t - TEMPLC[ilc - 1];
    double rt_ = t / T0;
    double xn = (p / (BOLTZ * t)) * 1e3;
    double rhorat = xn / xn0;
    double rho_molec[7];
    for (int m = 0; m < 7; ++m) rho_molec[m] = rhorat * wk[m] / wtot;

    for (int64_t iw = 0; iw < in.nwn; ++iw) {
      const double wn = in.wn[iw];
      const double rft = wn * std::tanh(RADCT * wn / (2.0 * t));
      // LINES: molecule loop then the J/JJ walk (modm.f90:316-431)
      for (int i = 1; i <= 39; ++i) {
        double w_species = wk[i - 1];
        int64_t nb = in.nblm[i - 1];
        if (w_species == 0.0 || nb == 0) continue;
        const double* xnu0 = &in.xnu0[(i - 1) * in.lmax];
        const double* s0a = &in.s0[(i - 1) * in.lmax];
        const double* alpf = &in.alpf[(i - 1) * in.lmax];
        const double* alps = &in.alps[(i - 1) * in.lmax];
        const double* ea = &in.e[(i - 1) * in.lmax];
        const double* xa = &in.x[(i - 1) * in.lmax];
        const double* dla = &in.deltnu[(i - 1) * in.lmax];
        const double* xga = &in.xg[(i - 1) * in.lmax];
        const double* isoa = &in.iso[(i - 1) * in.lmax];
        const double* rmola = &in.rmol[(i - 1) * in.lmax];
        const double* sdepa = &in.sdep[(i - 1) * in.lmax];

        double sf = 0.0, aip = 0.0, bip = 0.0;
        int64_t j = 0;
        while (j < nb) {
          int64_t jj = j;
          double xgj = xga[j];
          if (xgj == -1.0 || xgj == -3.0 || xgj == -5.0) {
            jj = j + 1;
            double A[4] = {0, 0, 0, 0}, B[4] = {0, 0, 0, 0};
            if (jj < nb) {
              A[0] = xnu0[jj]; A[1] = alpf[jj]; A[2] = rmola[jj]; A[3] = xa[jj];
              B[0] = s0a[jj]; B[1] = ea[jj]; B[2] = alps[jj]; B[3] = dla[jj];
            }
            if (xgj == -5.0 && j >= 1 && xga[j - 1] == -5.0) {
              jj += 1;
              if (jj < nb) {
                double rho_i = (i <= 7) ? rho_molec[i - 1]
                                        : rhorat * wk[i - 1] / wtot;
                double rho_for = (rhorat - rho_i) / rhorat;
                double rho_sel = rho_i / rhorat;
                double A2[4] = {xnu0[jj], alpf[jj], rmola[jj], xa[jj]};
                double B2[4] = {s0a[jj], ea[jj], alps[jj], dla[jj]};
                for (int q = 0; q < 4; ++q) {
                  A[q] = rho_for * A[q] + rho_sel * A2[q];
                  B[q] = rho_for * B[q] + rho_sel * B2[q];
                }
              }
            }
            aip = A[ilc - 1] + (A[ilc] - A[ilc - 1]) * rectlc * tmpdif;
            bip = B[ilc - 1] + (B[ilc] - B[ilc - 1]) * rectlc * tmpdif;
            // SCLCPL/SCLHW/Y0RES are the driver defaults (1, 1, 0)
          }

          double s0_adj = s0a[j] * (xnu0[j] * (1.0 - std::exp(-RADCT * xnu0[j] / T0)));
          double xnu = xnu0[j] + dla[j] * (xn / xn0);

          if (std::fabs(wn - xnu) > DELTNUC && i != 7) { j = jj + 1; continue; }

          int iso_i = (int)isoa[j];
          if (iso_i < 1) iso_i = 1;
          if (iso_i > 9) iso_i = 9;
          double xipsf = scor[(i - 1) * 9 + (iso_i - 1)];
          double s = s0_adj * (std::exp(-RADCT * ea[j] / t) /
                               std::exp(-RADCT * ea[j] / T0)) * xipsf;
          double stild = s * (1.0 + std::exp(-RADCT * xnu / t)) /
                         (xnu * (1.0 - std::exp(-RADCT * xnu / T0)));
          double xtild = xa[j];
          double rho_m = rhorat * wk[i - 1] / wtot;
          double alfa0i = alpf[j] * std::pow(rt_, xtild);
          double hwhmsi = alps[j] * std::pow(rt_, xtild);
          double hwhm_c = alfa0i * (rhorat - rho_m) + hwhmsi * rho_m;

          double m_ = in.smass[(i - 1) * 9 + (iso_i - 1)];
          if (m_ <= 0) m_ = in.smass[(i - 1) * 9];
          double hwhm_d = (xnu / CLIGHT) *
              std::sqrt(2.0 * std::log(2.0) * BOLTZ * t * AVOGAD / m_);

          if (xga[j] == -3.0) hwhm_c *= (1.0 - aip * rp - bip * rp2);
          double zeta = hwhm_c / (hwhm_c + hwhm_d);
          LsfArgs a{xga[j], rp, rp2, aip, bip, hwhm_c, wn, xnu, hwhm_d,
                    sdepa[j], i};
          double sls = (std::fabs(wn - xnu) > 100.0 * hwhm_d || zeta > 0.99)
                           ? lsf_lortz(a)
                           : lsf_sdvoigt(a);
          sf += stild * sls;
          j = jj + 1;
        }
        double od = rft * w_species * sf;
        checksum += od;
        if (dump) out[(size_t(k) * in.nwn + iw) * 39 + (i - 1)] = od;
      }
    }
  }
  auto t1c = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1c - t0c).count();
  double evals = double(in.nlay) * double(in.nwn) * double(total_lines);

  if (dump) {
    FILE* fo = std::fopen(argv[2], "wb");
    std::fwrite(out.data(), sizeof(double), out.size(), fo);
    std::fclose(fo);
  }
  std::printf(
      "{\"evals\": %.0f, \"seconds\": %.6f, \"evals_per_s\": %.6e, "
      "\"total_lines\": %lld, \"checksum\": %.6e}\n",
      evals, secs, evals / secs, (long long)total_lines, checksum);
  return 0;
}
