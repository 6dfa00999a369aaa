// Newell demagnetization tensor assembly (host-side native kernel).
//
// C++ implementation of the second-difference Newell-tensor table built in
// dpde_tpu/physics/demag.py (the TPU framework's replacement for the
// reference's native MagTense magnetostatics, tests/test_llg_pde_loss.py:
// 89-107). Assembly is O(nx*ny*27) float64 evaluations of the Newell f/g
// auxiliary functions; for large grids this dominates kernel-build time in
// numpy, so it is provided natively and loaded via ctypes
// (dpde_tpu/native/newell_native.py). Build: native/build.sh.

#include <cmath>
#include <cstddef>

namespace {

inline double safe_div(double a, double b) { return b == 0.0 ? 0.0 : a / b; }

// f(x,y,z): auxiliary for diagonal components (even in all arguments).
double newell_f(double x, double y, double z) {
  x = std::fabs(x);
  y = std::fabs(y);
  z = std::fabs(z);
  const double r = std::sqrt(x * x + y * y + z * z);
  const double xz = std::sqrt(x * x + z * z);
  const double xy = std::sqrt(x * x + y * y);
  double out = 0.0;
  if (xz > 0.0) out += 0.5 * y * (z * z - x * x) * std::asinh(safe_div(y, xz));
  if (xy > 0.0) out += 0.5 * z * (y * y - x * x) * std::asinh(safe_div(z, xy));
  if (x > 0.0 && r > 0.0) out -= x * y * z * std::atan(safe_div(y * z, x * r));
  out += (2.0 * x * x - y * y - z * z) * r / 6.0;
  return out;
}

// g(x,y,z): auxiliary for off-diagonal components (odd in x and y, even in
// z). Guards protect 0/0 only; `!= 0` conditions keep the parity intact
// (see the matching comment in demag.py).
double newell_g(double x, double y, double z) {
  z = std::fabs(z);
  const double r = std::sqrt(x * x + y * y + z * z);
  const double xy = std::sqrt(x * x + y * y);
  const double yz = std::sqrt(y * y + z * z);
  const double xz = std::sqrt(x * x + z * z);
  double out = 0.0;
  if (xy > 0.0) out += x * y * z * std::asinh(safe_div(z, xy));
  if (yz > 0.0)
    out += (y / 6.0) * (3.0 * z * z - y * y) * std::asinh(safe_div(x, yz));
  if (xz > 0.0)
    out += (x / 6.0) * (3.0 * z * z - x * x) * std::asinh(safe_div(y, xz));
  if (z != 0.0) out -= (z * z * z / 6.0) * std::atan(safe_div(x * y, z * r));
  if (y != 0.0)
    out -= (z * y * y / 2.0) * std::atan(safe_div(x * z, y * r));
  if (x != 0.0)
    out -= (z * x * x / 2.0) * std::atan(safe_div(y * z, x * r));
  out -= x * y * z * r / 3.0;
  return out;
}

// Triple second central difference with weights (1, -2, 1) per axis.
template <typename F>
double second_difference(F fun, double X, double Y, double Z, double dx,
                         double dy, double dz) {
  static const double w[3] = {1.0, -2.0, 1.0};
  double acc = 0.0;
  for (int i = -1; i <= 1; ++i)
    for (int j = -1; j <= 1; ++j)
      for (int k = -1; k <= 1; ++k)
        acc += w[i + 1] * w[j + 1] * w[k + 1] *
               fun(X + i * dx, Y + j * dy, Z + k * dz);
  return acc;
}

}  // namespace

extern "C" {

// out: (2*nx, 2*ny, 6) row-major, circulant order (displacement d at index
// d mod 2n), components (Nxx, Nyy, Nzz, Nxy, Nxz, Nyz).
void newell_tensor_2d(int nx, int ny, double dx, double dy, double dz,
                      double* out) {
  const double scale = 1.0 / (4.0 * M_PI * dx * dy * dz);
  const int wx = 2 * nx, wy = 2 * ny;
#pragma omp parallel for collapse(2) schedule(static)
  for (int ri = 0; ri < wx; ++ri) {
    for (int rj = 0; rj < wy; ++rj) {
      // displacement values: index i holds ((i + nx - 1) -> -(nx-1)..nx)
      const int di = ri <= nx ? ri : ri - wx;  // circulant -> signed disp
      const int dj = rj <= ny ? rj : rj - wy;
      const double X = di * dx, Y = dj * dy, Z = 0.0;
      double* cell = out + (static_cast<size_t>(ri) * wy + rj) * 6;
      cell[0] = -scale * second_difference(newell_f, X, Y, Z, dx, dy, dz);
      cell[1] = -scale * second_difference(
                            [](double a, double b, double c) {
                              return newell_f(b, a, c);
                            },
                            X, Y, Z, dx, dy, dz);
      cell[2] = -scale * second_difference(
                            [](double a, double b, double c) {
                              return newell_f(c, b, a);
                            },
                            X, Y, Z, dx, dy, dz);
      cell[3] = -scale * second_difference(newell_g, X, Y, Z, dx, dy, dz);
      cell[4] = -scale * second_difference(
                            [](double a, double b, double c) {
                              return newell_g(a, c, b);
                            },
                            X, Y, Z, dx, dy, dz);
      cell[5] = -scale * second_difference(
                            [](double a, double b, double c) {
                              return newell_g(b, c, a);
                            },
                            X, Y, Z, dx, dy, dz);
    }
  }
}

}  // extern "C"
