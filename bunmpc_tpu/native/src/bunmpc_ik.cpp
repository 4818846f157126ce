// Native (C++17) golden reference for the kinematic Gauss-Newton DDP (IK)
// half of the kino-dynamic MPC, plus the chained ADMM->IK solve.
//
// Mirrors, dependency-free (no Eigen/Pinocchio/Crocoddyl), the semantics of
// the reference stack's IK (reference src/ik/inverse_kinematics.cpp:54-103,
// src/ik/action_model.cpp:43-119, chained by src/motion_planner/
// kino_dyn.cpp:39-58):
//   * "dynamics" = double integrator on (q, v) with u = vdot, semi-implicit
//     Euler on the free-flyer manifold (v+ = v + u dt; q+ = q (+) v+ dt)
//   * costs = weighted-quadratic residuals (EE position tracking, CoM +
//     centroidal-momentum tracking from the dynamics plan, state & control
//     regularization) — crocoddyl CostModelResidual semantics, running
//     costs scaled by dt
//   * solver = Riccati sweep with Gauss-Newton cost Hessians and a parallel
//     line search over a fixed alpha grid (best-accepted)
//
// Derivatives are CENTRAL FINITE DIFFERENCES in the tangent space (double
// precision, h = 1e-6 -> ~1e-9 accurate), which keeps this implementation
// independent of both the JAX autodiff and the hand-derived analytic
// Jacobians it golden-tests (mpc/ik.py build_jacobian_fns).
//
// Exposed through a C ABI for ctypes (no pybind11 in this toolchain); the
// kinodyn entry chains bunmpc_biconvex_solve (bunmpc_native.cpp) with the
// IK exactly like the reference KinoDynMP.

#include <cmath>
#include <cstring>
#include <limits>
#include <vector>

// from bunmpc_native.cpp (same shared library)
extern "C" void bunmpc_biconvex_solve(
    int H, int ne, double m, const double* cnt, const double* r,
    const double* dts, const double* x_init, const double* W,
    const double* X_ref, const double* W_F, double rho, int max_admm,
    int fista_max_iters, double fista_tol, double exit_tol, double beta,
    double L0_x, double L0_f, double mu, const double* lb_x,
    const double* ub_x, double* X, double* F, double* viol_out,
    int* iters_out);

namespace {

using std::vector;

// ---------- small dense linear algebra ----------

inline void mat3_mul(const double* A, const double* B, double* C) {
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += A[3 * i + k] * B[3 * k + j];
      C[3 * i + j] = s;
    }
}

inline void mat3_vec(const double* A, const double* x, double* y) {
  for (int i = 0; i < 3; ++i)
    y[i] = A[3 * i] * x[0] + A[3 * i + 1] * x[1] + A[3 * i + 2] * x[2];
}

inline void mat3T_vec(const double* A, const double* x, double* y) {
  for (int i = 0; i < 3; ++i)
    y[i] = A[i] * x[0] + A[3 + i] * x[1] + A[6 + i] * x[2];
}

inline void cross3(const double* a, const double* b, double* c) {
  c[0] = a[1] * b[2] - a[2] * b[1];
  c[1] = a[2] * b[0] - a[0] * b[2];
  c[2] = a[0] * b[1] - a[1] * b[0];
}

// Cholesky solve of a dense SPD n x n system (in-place factor copy).
bool chol_solve(int n, const double* A, const double* b, double* x,
                vector<double>& Lbuf) {
  Lbuf.assign(A, A + n * n);
  double* L = Lbuf.data();
  for (int j = 0; j < n; ++j) {
    double d = L[j * n + j];
    for (int k = 0; k < j; ++k) d -= L[j * n + k] * L[j * n + k];
    if (d <= 0) return false;
    d = std::sqrt(d);
    L[j * n + j] = d;
    for (int i = j + 1; i < n; ++i) {
      double s = L[i * n + j];
      for (int k = 0; k < j; ++k) s -= L[i * n + k] * L[j * n + k];
      L[i * n + j] = s / d;
    }
  }
  // forward: L z = b
  for (int i = 0; i < n; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= L[i * n + k] * x[k];
    x[i] = s / L[i * n + i];
  }
  // backward: L' x = z
  for (int i = n - 1; i >= 0; --i) {
    double s = x[i];
    for (int k = i + 1; k < n; ++k) s -= L[k * n + i] * x[k];
    x[i] = s / L[i * n + i];
  }
  return true;
}

// ---------- quaternion / SE(3) ops (mirror utils/quat.py, xyzw) ----------

inline void quat_to_rot(const double* q, double* R) {
  const double x = q[0], y = q[1], z = q[2], w = q[3];
  R[0] = 1 - 2 * (y * y + z * z);
  R[1] = 2 * (x * y - z * w);
  R[2] = 2 * (x * z + y * w);
  R[3] = 2 * (x * y + z * w);
  R[4] = 1 - 2 * (x * x + z * z);
  R[5] = 2 * (y * z - x * w);
  R[6] = 2 * (x * z - y * w);
  R[7] = 2 * (y * z + x * w);
  R[8] = 1 - 2 * (x * x + y * y);
}

inline void quat_mul(const double* a, const double* b, double* out) {
  out[0] = a[3] * b[0] + a[0] * b[3] + a[1] * b[2] - a[2] * b[1];
  out[1] = a[3] * b[1] - a[0] * b[2] + a[1] * b[3] + a[2] * b[0];
  out[2] = a[3] * b[2] + a[0] * b[1] - a[1] * b[0] + a[2] * b[3];
  out[3] = a[3] * b[3] - a[0] * b[0] - a[1] * b[1] - a[2] * b[2];
}

inline void quat_normalize(double* q) {
  const double n =
      std::sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3]);
  for (int i = 0; i < 4; ++i) q[i] /= n;
}

// rotation vector -> quaternion
inline void exp3(const double* w, double* q) {
  const double sq = w[0] * w[0] + w[1] * w[1] + w[2] * w[2];
  double s, c;
  if (sq < 1e-12) {
    s = 0.5 - sq / 48.0;
    c = 1.0 - sq / 8.0;
  } else {
    const double t = std::sqrt(sq);
    s = std::sin(0.5 * t) / t;
    c = std::cos(0.5 * t);
  }
  q[0] = w[0] * s;
  q[1] = w[1] * s;
  q[2] = w[2] * s;
  q[3] = c;
}

// quaternion -> rotation vector
inline void log3_quat(const double* q_in, double* w) {
  double q[4] = {q_in[0], q_in[1], q_in[2], q_in[3]};
  if (q[3] < 0)
    for (int i = 0; i < 4; ++i) q[i] = -q[i];
  const double sq = q[0] * q[0] + q[1] * q[1] + q[2] * q[2];
  double scale;
  if (sq < 1e-12) {
    const double ws = q[3] < 1e-9 ? 1e-9 : q[3];
    scale = (2.0 / ws) * (1.0 - sq / (3.0 * ws * ws));
  } else {
    const double vn = std::sqrt(sq);
    scale = 2.0 * std::atan2(vn, q[3]) / vn;
  }
  w[0] = q[0] * scale;
  w[1] = q[1] * scale;
  w[2] = q[2] * scale;
}

inline void skew(const double* w, double* K) {
  K[0] = 0;     K[1] = -w[2]; K[2] = w[1];
  K[3] = w[2];  K[4] = 0;     K[5] = -w[0];
  K[6] = -w[1]; K[7] = w[0];  K[8] = 0;
}

// SO(3) left Jacobian V(w)
inline void so3_left_jacobian(const double* w, double* V) {
  const double sq = w[0] * w[0] + w[1] * w[1] + w[2] * w[2];
  double a, b;
  if (sq < 1e-10) {
    a = 0.5 - sq / 24.0;
    b = 1.0 / 6.0 - sq / 120.0;
  } else {
    const double t = std::sqrt(sq);
    a = (1.0 - std::cos(t)) / sq;
    b = (t - std::sin(t)) / (sq * t);
  }
  double K[9], K2[9];
  skew(w, K);
  mat3_mul(K, K, K2);
  for (int i = 0; i < 9; ++i) V[i] = a * K[i] + b * K2[i];
  V[0] += 1;
  V[4] += 1;
  V[8] += 1;
}

// V(w)^-1
inline void so3_left_jacobian_inv(const double* w, double* Vi) {
  const double sq = w[0] * w[0] + w[1] * w[1] + w[2] * w[2];
  double b;
  if (sq < 1e-10) {
    b = 1.0 / 12.0 + sq / 720.0;
  } else {
    const double t = std::sqrt(sq);
    b = 1.0 / sq - (1.0 + std::cos(t)) / (2.0 * t * std::sin(t));
  }
  double K[9], K2[9];
  skew(w, K);
  mat3_mul(K, K, K2);
  for (int i = 0; i < 9; ++i) Vi[i] = -0.5 * K[i] + b * K2[i];
  Vi[0] += 1;
  Vi[4] += 1;
  Vi[8] += 1;
}

// integrate a local-frame twist on SE(3): p' = p + R V(dw) dv; q' = q * exp(dw)
inline void se3_integrate(const double* p, const double* q, const double* dv,
                          const double* dw, double* p_new, double* q_new) {
  double R[9], V[9], Vdv[3], tmp[3], dq[4];
  quat_to_rot(q, R);
  so3_left_jacobian(dw, V);
  mat3_vec(V, dv, Vdv);
  mat3_vec(R, Vdv, tmp);
  for (int i = 0; i < 3; ++i) p_new[i] = p[i] + tmp[i];
  exp3(dw, dq);
  quat_mul(q, dq, q_new);
  quat_normalize(q_new);
}

// local-frame twist with integrate(x1, (dv, dw)) == x2
inline void se3_difference(const double* p1, const double* q1,
                           const double* p2, const double* q2, double* dv,
                           double* dw) {
  double qc[4] = {-q1[0], -q1[1], -q1[2], q1[3]}, qr[4];
  quat_mul(qc, q2, qr);
  log3_quat(qr, dw);
  double R1[9], dp[3], dpl[3], Vi[9];
  quat_to_rot(q1, R1);
  for (int i = 0; i < 3; ++i) dp[i] = p2[i] - p1[i];
  mat3T_vec(R1, dp, dpl);
  so3_left_jacobian_inv(dw, Vi);
  mat3_vec(Vi, dpl, dv);
}

// ---------- robot model + kinematics (mirror kin/algorithms.py) ----------

struct Model {
  int nj;                 // revolute joints; nb = nj + 1, nv = nj + 6
  const int* parent;      // (nj,) parent body index
  const double* jrot;     // (nj, 9) joint frame rotation in parent body frame
  const double* jpos;     // (nj, 3)
  const double* axis;     // (nj, 3) axis in child body frame
  const double* mass;     // (nb,)
  const double* bcom;     // (nb, 3)
  const double* inertia;  // (nb, 9)
  int ne;                 // end-effector frames
  const int* eff_body;    // (ne,)
  const double* eff_pos;  // (ne, 3)
  int nb() const { return nj + 1; }
  int nv() const { return nj + 6; }
  int nq() const { return nj + 7; }
};

// axis-angle rotation about a fixed axis
inline void axis_angle_rot(const double* a, double th, double* R) {
  const double c = std::cos(th), s = std::sin(th), C = 1 - c;
  R[0] = c + a[0] * a[0] * C;
  R[1] = a[0] * a[1] * C - a[2] * s;
  R[2] = a[0] * a[2] * C + a[1] * s;
  R[3] = a[1] * a[0] * C + a[2] * s;
  R[4] = c + a[1] * a[1] * C;
  R[5] = a[1] * a[2] * C - a[0] * s;
  R[6] = a[2] * a[0] * C - a[1] * s;
  R[7] = a[2] * a[1] * C + a[0] * s;
  R[8] = c + a[2] * a[2] * C;
}

// FK: world rotations (nb, 9) and positions (nb, 3)
void fk(const Model& mdl, const double* q, double* R, double* p) {
  quat_to_rot(q + 3, R);
  p[0] = q[0];
  p[1] = q[1];
  p[2] = q[2];
  for (int j = 0; j < mdl.nj; ++j) {
    const int b = mdl.parent[j];
    double Rj[9], Rrot[9], tmp[9], off[3];
    axis_angle_rot(mdl.axis + 3 * j, q[7 + j], Rrot);
    mat3_mul(mdl.jrot + 9 * j, Rrot, Rj);
    mat3_mul(R + 9 * b, Rj, tmp);
    std::memcpy(R + 9 * (j + 1), tmp, sizeof tmp);
    mat3_vec(R + 9 * b, mdl.jpos + 3 * j, off);
    for (int k = 0; k < 3; ++k) p[3 * (j + 1) + k] = p[3 * b + k] + off[k];
  }
}

// world angular/linear velocities of every body-frame origin
void body_velocities(const Model& mdl, const double* q, const double* v,
                     const double* R, const double* p, double* omega,
                     double* vel) {
  mat3_vec(R, v, vel);            // base linear (world)
  mat3_vec(R, v + 3, omega);      // base angular (world)
  for (int j = 0; j < mdl.nj; ++j) {
    const int b = mdl.parent[j], body = j + 1;
    double aw[3], rrel[3], wxr[3];
    mat3_vec(R + 9 * body, mdl.axis + 3 * j, aw);
    for (int k = 0; k < 3; ++k) rrel[k] = p[3 * body + k] - p[3 * b + k];
    cross3(omega + 3 * b, rrel, wxr);
    for (int k = 0; k < 3; ++k) {
      omega[3 * body + k] = omega[3 * b + k] + aw[k] * v[6 + j];
      vel[3 * body + k] = vel[3 * b + k] + wxr[k];
    }
  }
}

// fused com / centroidal momentum / EE positions (mirror
// kin.centroidal_state_and_frames)
void centroidal_state_and_frames(const Model& mdl, const double* q,
                                 const double* v, double* com, double* h,
                                 double* ee) {
  const int nb = mdl.nb();
  vector<double> R(9 * nb), p(3 * nb), omega(3 * nb), vel(3 * nb);
  fk(mdl, q, R.data(), p.data());
  body_velocities(mdl, q, v, R.data(), p.data(), omega.data(), vel.data());

  vector<double> c_w(3 * nb), v_com(3 * nb);
  double M = 0;
  com[0] = com[1] = com[2] = 0;
  for (int b = 0; b < nb; ++b) {
    double coff[3], wxc[3];
    mat3_vec(R.data() + 9 * b, mdl.bcom + 3 * b, coff);
    cross3(omega.data() + 3 * b, coff, wxc);
    for (int k = 0; k < 3; ++k) {
      c_w[3 * b + k] = p[3 * b + k] + coff[k];
      v_com[3 * b + k] = vel[3 * b + k] + wxc[k];
      com[k] += mdl.mass[b] * c_w[3 * b + k];
    }
    M += mdl.mass[b];
  }
  for (int k = 0; k < 3; ++k) com[k] /= M;
  for (int k = 0; k < 6; ++k) h[k] = 0;
  for (int b = 0; b < nb; ++b) {
    for (int k = 0; k < 3; ++k) h[k] += mdl.mass[b] * v_com[3 * b + k];
    // I_w = R I R'
    double IR[9], Iw[9], Iom[3], d[3], dxv[3];
    double RT[9];
    const double* Rb = R.data() + 9 * b;
    for (int i = 0; i < 3; ++i)
      for (int j2 = 0; j2 < 3; ++j2) RT[3 * i + j2] = Rb[3 * j2 + i];
    mat3_mul(mdl.inertia + 9 * b, RT, IR);
    mat3_mul(Rb, IR, Iw);
    mat3_vec(Iw, omega.data() + 3 * b, Iom);
    for (int k = 0; k < 3; ++k) d[k] = c_w[3 * b + k] - com[k];
    cross3(d, v_com.data() + 3 * b, dxv);
    for (int k = 0; k < 3; ++k) h[3 + k] += Iom[k] + mdl.mass[b] * dxv[k];
  }
  for (int e = 0; e < mdl.ne; ++e) {
    const int b = mdl.eff_body[e];
    double off[3];
    mat3_vec(R.data() + 9 * b, mdl.eff_pos + 3 * e, off);
    for (int k = 0; k < 3; ++k) ee[3 * e + k] = p[3 * b + k] + off[k];
  }
}

// configuration integrate / state ops on x = [q (nq), v (nv)]
void cfg_integrate(const Model& mdl, const double* q, const double* dq,
                   double* q_new) {
  se3_integrate(q, q + 3, dq, dq + 3, q_new, q_new + 3);
  for (int j = 0; j < mdl.nj; ++j) q_new[7 + j] = q[7 + j] + dq[6 + j];
}

void state_perturb(const Model& mdl, const double* x, const double* dx,
                   double* x2) {
  const int nq = mdl.nq(), nv = mdl.nv();
  cfg_integrate(mdl, x, dx, x2);
  for (int i = 0; i < nv; ++i) x2[nq + i] = x[nq + i] + dx[nv + i];
}

// tangent difference x2 (-) x1 -> (2nv,)
void state_diff(const Model& mdl, const double* x1, const double* x2,
                double* dx) {
  const int nq = mdl.nq(), nv = mdl.nv();
  se3_difference(x1, x1 + 3, x2, x2 + 3, dx, dx + 3);
  for (int j = 0; j < mdl.nj; ++j) dx[6 + j] = x2[7 + j] - x1[7 + j];
  for (int i = 0; i < nv; ++i) dx[nv + i] = x2[nq + i] - x1[nq + i];
}

// semi-implicit Euler step
void step(const Model& mdl, const double* x, const double* u, double dt,
          double* x_next) {
  const int nq = mdl.nq(), nv = mdl.nv();
  vector<double> v_next(nv), dq(nv);
  for (int i = 0; i < nv; ++i) v_next[i] = x[nq + i] + u[i] * dt;
  for (int i = 0; i < nv; ++i) dq[i] = v_next[i] * dt;
  cfg_integrate(mdl, x, dq.data(), x_next);
  for (int i = 0; i < nv; ++i) x_next[nq + i] = v_next[i];
}

// ---------- the IK problem (mirror mpc/ik.py residual stack) ----------

struct IkProblem {
  const Model* mdl;
  int H;                    // stage knots
  const double* dts;        // (H,)
  const double* ee_targets; // (H, ne, 3)
  const double* ee_wts;     // (H, ne)
  const double* com_ref;    // (H+1, 3)
  const double* mom_ref;    // (H+1, 6)
  double com_wt, mom_wt;
  const double* w_sd;       // (H+1, 2nv) state-reg weights (already scaled)
  const double* x_reg;      // (H+1, nq+nv)
  const double* ctrl_w;     // (H, nv) control weights (already scaled)
  int nr() const { return 3 * mdl->ne + 9 + 2 * mdl->nv(); }
  int nrt() const { return 9 + 2 * mdl->nv(); }
};

// stage residuals + weights at knot k (k == H -> terminal: no EE rows)
void residuals(const IkProblem& pb, const double* x, int k, double* r,
               double* w) {
  const Model& mdl = *pb.mdl;
  const int nv = mdl.nv(), ne = mdl.ne;
  double com[3], h[6];
  vector<double> ee(3 * ne), sd(2 * nv);
  centroidal_state_and_frames(mdl, x, x + mdl.nq(), com, h, ee.data());
  state_diff(mdl, pb.x_reg + k * (mdl.nq() + nv), x, sd.data());
  int o = 0;
  if (k < pb.H) {
    for (int e = 0; e < ne; ++e)
      for (int c = 0; c < 3; ++c, ++o) {
        r[o] = ee[3 * e + c] - pb.ee_targets[(k * ne + e) * 3 + c];
        if (w) w[o] = pb.ee_wts[k * ne + e];
      }
  }
  for (int c = 0; c < 3; ++c, ++o) {
    r[o] = com[c] - pb.com_ref[3 * k + c];
    if (w) w[o] = pb.com_wt;
  }
  for (int c = 0; c < 6; ++c, ++o) {
    r[o] = h[c] - pb.mom_ref[6 * k + c];
    if (w) w[o] = pb.mom_wt;
  }
  for (int c = 0; c < 2 * nv; ++c, ++o) {
    r[o] = sd[c];
    if (w) w[o] = pb.w_sd[k * 2 * nv + c];
  }
}

double stage_cost(const IkProblem& pb, const double* x, const double* u,
                  int k) {
  const int nv = pb.mdl->nv();
  vector<double> r(pb.nr()), w(pb.nr());
  residuals(pb, x, k, r.data(), w.data());
  double c = 0;
  for (int i = 0; i < pb.nr(); ++i) c += w[i] * r[i] * r[i];
  for (int i = 0; i < nv; ++i) c += pb.ctrl_w[k * nv + i] * u[i] * u[i];
  return 0.5 * pb.dts[k] * c;
}

double term_cost(const IkProblem& pb, const double* x) {
  vector<double> r(pb.nrt()), w(pb.nrt());
  residuals(pb, x, pb.H, r.data(), w.data());
  double c = 0;
  for (int i = 0; i < pb.nrt(); ++i) c += w[i] * r[i] * r[i];
  return 0.5 * c;
}

double total_cost(const IkProblem& pb, const double* xs, const double* us) {
  const int nx = pb.mdl->nq() + pb.mdl->nv(), nv = pb.mdl->nv();
  double c = 0;
  for (int k = 0; k < pb.H; ++k) c += stage_cost(pb, xs + k * nx, us + k * nv, k);
  return c + term_cost(pb, xs + pb.H * nx);
}

// central-difference residual Jacobian wrt the state tangent: (nrows, ndx)
void residual_jacobian(const IkProblem& pb, const double* x, int k, int nrows,
                       double* J) {
  const Model& mdl = *pb.mdl;
  const int nv = mdl.nv(), ndx = 2 * nv, nx = mdl.nq() + nv;
  const double hfd = 1e-6;
  vector<double> dx(ndx, 0.0), xp(nx), rp(nrows), rm(nrows);
  for (int i = 0; i < ndx; ++i) {
    dx[i] = hfd;
    state_perturb(mdl, x, dx.data(), xp.data());
    residuals(pb, xp.data(), k, rp.data(), nullptr);
    dx[i] = -hfd;
    state_perturb(mdl, x, dx.data(), xp.data());
    residuals(pb, xp.data(), k, rm.data(), nullptr);
    dx[i] = 0.0;
    for (int rI = 0; rI < nrows; ++rI)
      J[rI * ndx + i] = (rp[rI] - rm[rI]) / (2 * hfd);
  }
}

// central-difference dynamics Jacobians Fx (ndx, ndx), Fu (ndx, nv) of the
// Euler step in tangent coordinates
void dynamics_jacobians(const IkProblem& pb, const double* x, const double* u,
                        double dt, double* Fx, double* Fu) {
  const Model& mdl = *pb.mdl;
  const int nv = mdl.nv(), ndx = 2 * nv, nx = mdl.nq() + nv;
  const double hfd = 1e-6;
  vector<double> x_next(nx), xp(nx), xn(nx), dplus(ndx), dminus(ndx);
  vector<double> dx(ndx, 0.0), up(nv);
  step(mdl, x, u, dt, x_next.data());
  for (int i = 0; i < ndx; ++i) {
    dx[i] = hfd;
    state_perturb(mdl, x, dx.data(), xp.data());
    step(mdl, xp.data(), u, dt, xn.data());
    state_diff(mdl, x_next.data(), xn.data(), dplus.data());
    dx[i] = -hfd;
    state_perturb(mdl, x, dx.data(), xp.data());
    step(mdl, xp.data(), u, dt, xn.data());
    state_diff(mdl, x_next.data(), xn.data(), dminus.data());
    dx[i] = 0.0;
    for (int rI = 0; rI < ndx; ++rI)
      Fx[rI * ndx + i] = (dplus[rI] - dminus[rI]) / (2 * hfd);
  }
  for (int i = 0; i < nv; ++i) {
    std::memcpy(up.data(), u, sizeof(double) * nv);
    up[i] += hfd;
    step(mdl, x, up.data(), dt, xn.data());
    state_diff(mdl, x_next.data(), xn.data(), dplus.data());
    up[i] -= 2 * hfd;
    step(mdl, x, up.data(), dt, xn.data());
    state_diff(mdl, x_next.data(), xn.data(), dminus.data());
    for (int rI = 0; rI < ndx; ++rI)
      Fu[rI * nv + i] = (dplus[rI] - dminus[rI]) / (2 * hfd);
  }
}

// ---------- GN-DDP (mirror solvers/ddp.py solve) ----------

void rollout(const IkProblem& pb, const double* x0, const double* us,
             double* xs) {
  const int nx = pb.mdl->nq() + pb.mdl->nv(), nv = pb.mdl->nv();
  std::memcpy(xs, x0, sizeof(double) * nx);
  for (int k = 0; k < pb.H; ++k)
    step(*pb.mdl, xs + k * nx, us + k * nv, pb.dts[k], xs + (k + 1) * nx);
}

void ik_solve(const IkProblem& pb, const double* x0, int n_iters,
              const double* alphas, int n_alphas, double reg, double* xs,
              double* us, double* cost_out) {
  const Model& mdl = *pb.mdl;
  const int nv = mdl.nv(), ndx = 2 * nv, nx = mdl.nq() + nv;
  const int H = pb.H, nr = pb.nr(), nrt = pb.nrt();

  vector<double> us_cur(H * nv, 0.0), xs_cur((H + 1) * nx);
  if (us) std::memcpy(us_cur.data(), us, sizeof(double) * H * nv);
  rollout(pb, x0, us_cur.data(), xs_cur.data());
  double cost = total_cost(pb, xs_cur.data(), us_cur.data());

  vector<double> Jr(H * nr * ndx), wst(H * nr), rst(H * nr);
  vector<double> Jt(nrt * ndx), wt(nrt), rt(nrt);
  vector<double> Fx(H * ndx * ndx), Fu(H * ndx * nv);
  vector<double> Vx(ndx), Vxx(ndx * ndx), Qx(ndx), Qu(nv), Qxx(ndx * ndx),
      Qux(nv * ndx), Quu(nv * nv);
  vector<double> kff(H * nv), Kfb(H * nv * ndx), Lbuf;
  vector<double> xs_try((H + 1) * nx), us_try(H * nv), dx(ndx);
  vector<double> xs_best((H + 1) * nx), us_best(H * nv);

  for (int it = 0; it < n_iters; ++it) {
    // derivatives at the current trajectory
    for (int k = 0; k < H; ++k) {
      residuals(pb, xs_cur.data() + k * nx, k, rst.data() + k * nr,
                wst.data() + k * nr);
      residual_jacobian(pb, xs_cur.data() + k * nx, k, nr,
                        Jr.data() + k * nr * ndx);
      dynamics_jacobians(pb, xs_cur.data() + k * nx, us_cur.data() + k * nv,
                         pb.dts[k], Fx.data() + k * ndx * ndx,
                         Fu.data() + k * ndx * nv);
    }
    residuals(pb, xs_cur.data() + H * nx, H, rt.data(), wt.data());
    residual_jacobian(pb, xs_cur.data() + H * nx, H, nrt, Jt.data());

    // terminal value function
    for (int i = 0; i < ndx; ++i) {
      double s = 0;
      for (int rI = 0; rI < nrt; ++rI) s += Jt[rI * ndx + i] * wt[rI] * rt[rI];
      Vx[i] = s;
    }
    for (int i = 0; i < ndx; ++i)
      for (int j = 0; j < ndx; ++j) {
        double s = 0;
        for (int rI = 0; rI < nrt; ++rI)
          s += Jt[rI * ndx + i] * wt[rI] * Jt[rI * ndx + j];
        Vxx[i * ndx + j] = s;
      }

    // backward Riccati sweep
    for (int k = H - 1; k >= 0; --k) {
      const double dt = pb.dts[k];
      const double* Jk = Jr.data() + k * nr * ndx;
      const double* wk = wst.data() + k * nr;
      const double* rk = rst.data() + k * nr;
      const double* Fxk = Fx.data() + k * ndx * ndx;
      const double* Fuk = Fu.data() + k * ndx * nv;
      // Qx = dt J'W r + Fx' Vx ; Qxx = dt J'W J + Fx' Vxx Fx
      vector<double> VxxFx(ndx * ndx), VxxFu(ndx * nv);
      for (int i = 0; i < ndx; ++i)
        for (int j = 0; j < ndx; ++j) {
          double s = 0;
          for (int l = 0; l < ndx; ++l) s += Vxx[i * ndx + l] * Fxk[l * ndx + j];
          VxxFx[i * ndx + j] = s;
        }
      for (int i = 0; i < ndx; ++i)
        for (int j = 0; j < nv; ++j) {
          double s = 0;
          for (int l = 0; l < ndx; ++l) s += Vxx[i * ndx + l] * Fuk[l * nv + j];
          VxxFu[i * nv + j] = s;
        }
      for (int i = 0; i < ndx; ++i) {
        double s = 0;
        for (int rI = 0; rI < nr; ++rI) s += Jk[rI * ndx + i] * wk[rI] * rk[rI];
        double fv = 0;
        for (int l = 0; l < ndx; ++l) fv += Fxk[l * ndx + i] * Vx[l];
        Qx[i] = dt * s + fv;
      }
      for (int i = 0; i < nv; ++i) {
        double lu = dt * pb.ctrl_w[k * nv + i] * us_cur[k * nv + i];
        double fv = 0;
        for (int l = 0; l < ndx; ++l) fv += Fuk[l * nv + i] * Vx[l];
        Qu[i] = lu + fv;
      }
      for (int i = 0; i < ndx; ++i)
        for (int j = 0; j < ndx; ++j) {
          double s = 0;
          for (int rI = 0; rI < nr; ++rI)
            s += Jk[rI * ndx + i] * wk[rI] * Jk[rI * ndx + j];
          double fvf = 0;
          for (int l = 0; l < ndx; ++l) fvf += Fxk[l * ndx + i] * VxxFx[l * ndx + j];
          Qxx[i * ndx + j] = dt * s + fvf;
        }
      for (int i = 0; i < nv; ++i)
        for (int j = 0; j < ndx; ++j) {
          double s = 0;
          for (int l = 0; l < ndx; ++l) s += Fuk[l * nv + i] * VxxFx[l * ndx + j];
          Qux[i * ndx + j] = s;
        }
      for (int i = 0; i < nv; ++i)
        for (int j = 0; j < nv; ++j) {
          double s = 0;
          for (int l = 0; l < ndx; ++l) s += Fuk[l * nv + i] * VxxFu[l * nv + j];
          Quu[i * nv + j] = s;
        }
      for (int i = 0; i < nv; ++i) {
        Quu[i * nv + i] += dt * pb.ctrl_w[k * nv + i] + reg;
      }
      // kff = -Quu^-1 Qu ; Kfb = -Quu^-1 Qux
      vector<double> col(nv);
      chol_solve(nv, Quu.data(), Qu.data(), col.data(), Lbuf);
      for (int i = 0; i < nv; ++i) kff[k * nv + i] = -col[i];
      vector<double> rhs(nv), sol(nv);
      for (int j = 0; j < ndx; ++j) {
        for (int i = 0; i < nv; ++i) rhs[i] = Qux[i * ndx + j];
        chol_solve(nv, Quu.data(), rhs.data(), sol.data(), Lbuf);
        for (int i = 0; i < nv; ++i) Kfb[(k * nv + i) * ndx + j] = -sol[i];
      }
      // Vx = Qx + Kfb' Qu ; Vxx = Qxx + Kfb' Qux (symmetrized)
      for (int i = 0; i < ndx; ++i) {
        double s = Qx[i];
        for (int l = 0; l < nv; ++l) s += Kfb[(k * nv + l) * ndx + i] * Qu[l];
        Vx[i] = s;
      }
      vector<double> Vxx_new(ndx * ndx);
      for (int i = 0; i < ndx; ++i)
        for (int j = 0; j < ndx; ++j) {
          double s = Qxx[i * ndx + j];
          for (int l = 0; l < nv; ++l)
            s += Kfb[(k * nv + l) * ndx + i] * Qux[l * ndx + j];
          Vxx_new[i * ndx + j] = s;
        }
      for (int i = 0; i < ndx; ++i)
        for (int j = 0; j < ndx; ++j)
          Vxx[i * ndx + j] = 0.5 * (Vxx_new[i * ndx + j] + Vxx_new[j * ndx + i]);
    }

    // forward pass over the alpha grid; accept the best if it improves
    double best_cost = std::numeric_limits<double>::infinity();
    for (int a = 0; a < n_alphas; ++a) {
      const double alpha = alphas[a];
      std::memcpy(xs_try.data(), x0, sizeof(double) * nx);
      for (int k = 0; k < H; ++k) {
        state_diff(mdl, xs_cur.data() + k * nx, xs_try.data() + k * nx,
                   dx.data());
        for (int i = 0; i < nv; ++i) {
          double u = us_cur[k * nv + i] + alpha * kff[k * nv + i];
          for (int l = 0; l < ndx; ++l)
            u += Kfb[(k * nv + i) * ndx + l] * dx[l];
          us_try[k * nv + i] = u;
        }
        step(mdl, xs_try.data() + k * nx, us_try.data() + k * nv, pb.dts[k],
             xs_try.data() + (k + 1) * nx);
      }
      const double c = total_cost(pb, xs_try.data(), us_try.data());
      if (c < best_cost) {
        best_cost = c;
        std::memcpy(xs_best.data(), xs_try.data(), sizeof(double) * (H + 1) * nx);
        std::memcpy(us_best.data(), us_try.data(), sizeof(double) * H * nv);
      }
    }
    if (best_cost < cost) {
      cost = best_cost;
      xs_cur.swap(xs_best);
      us_cur.swap(us_best);
    }
  }
  std::memcpy(xs, xs_cur.data(), sizeof(double) * (H + 1) * nx);
  std::memcpy(us, us_cur.data(), sizeof(double) * H * nv);
  *cost_out = cost;
}

}  // namespace

extern "C" {

// Kinematic GN-DDP IK solve (reference InverseKinematics::optimize).
// Layouts documented in native/bindings.py.
void bunmpc_ik_solve(
    // model
    int nj, const int* parent, const double* jrot, const double* jpos,
    const double* axis, const double* mass, const double* bcom,
    const double* inertia, int ne, const int* eff_body, const double* eff_pos,
    // problem
    int H, const double* dts, const double* ee_targets, const double* ee_wts,
    const double* com_ref, const double* mom_ref, double com_wt, double mom_wt,
    const double* w_sd, const double* x_reg, const double* ctrl_w,
    // solver config
    int n_iters, const double* alphas, int n_alphas, double reg,
    // in/out
    const double* x0, double* xs, double* us, double* cost_out) {
  Model mdl{nj, parent, jrot, jpos, axis, mass, bcom, inertia, ne, eff_body,
            eff_pos};
  IkProblem pb{&mdl,   H,      dts,    ee_targets, ee_wts, com_ref,
               mom_ref, com_wt, mom_wt, w_sd,       x_reg,  ctrl_w};
  ik_solve(pb, x0, n_iters, alphas, n_alphas, reg, xs, us, cost_out);
}

// One full kino-dynamic solve: centroidal ADMM -> IK tracking tasks from the
// dynamics plan -> GN-DDP (reference KinoDynMP::optimize, kino_dyn.cpp:39-58).
// The IK's com/mom references are OVERWRITTEN from the ADMM solution:
//   com_ref[k] = X[k][0:3]; mom_ref[k] = [m * X[k][3:6], X[k][6:9]].
void bunmpc_kinodyn_solve(
    // model (incl. total mass used by the dyn problem)
    int nj, const int* parent, const double* jrot, const double* jpos,
    const double* axis, const double* mass, const double* bcom,
    const double* inertia, int ne, const int* eff_body, const double* eff_pos,
    double m_total,
    // dynamics (ADMM) problem — layouts as bunmpc_biconvex_solve
    int H, const double* cnt, const double* r, const double* dts,
    const double* x_init, const double* W, const double* X_ref,
    const double* W_F, double rho, int max_admm, int fista_max_iters,
    double fista_tol, double exit_tol, double beta, double L0_x, double L0_f,
    double mu, const double* lb_x, const double* ub_x,
    // IK problem (ik_h <= H stage knots; com/mom refs filled from the ADMM X)
    int ik_h, const double* ik_dts, const double* ee_targets,
    const double* ee_wts, double com_wt, double mom_wt, const double* w_sd,
    const double* x_reg, const double* ctrl_w, int n_iters,
    const double* alphas, int n_alphas, double reg,
    // in/out
    const double* x0, double* X, double* F, double* viol_out, int* iters_out,
    double* xs, double* us, double* cost_out) {
  bunmpc_biconvex_solve(H, ne, m_total, cnt, r, dts, x_init, W, X_ref, W_F,
                        rho, max_admm, fista_max_iters, fista_tol, exit_tol,
                        beta, L0_x, L0_f, mu, lb_x, ub_x, X, F, viol_out,
                        iters_out);
  // dyn -> IK coupling (kino_dyn.cpp:50-56)
  vector<double> com_ref(3 * (ik_h + 1)), mom_ref(6 * (ik_h + 1));
  for (int k = 0; k <= ik_h; ++k) {
    for (int c = 0; c < 3; ++c) {
      com_ref[3 * k + c] = X[9 * k + c];
      mom_ref[6 * k + c] = m_total * X[9 * k + 3 + c];
      mom_ref[6 * k + 3 + c] = X[9 * k + 6 + c];
    }
  }
  Model mdl{nj, parent, jrot, jpos, axis, mass, bcom, inertia, ne, eff_body,
            eff_pos};
  IkProblem pb{&mdl,          ik_h,   ik_dts, ee_targets, ee_wts,
               com_ref.data(), mom_ref.data(), com_wt, mom_wt,
               w_sd,          x_reg,  ctrl_w};
  ik_solve(pb, x0, n_iters, alphas, n_alphas, reg, xs, us, cost_out);
}

// Standalone kinematics evaluations for fine-grained golden tests.
void bunmpc_centroidal_state(int nj, const int* parent, const double* jrot,
                             const double* jpos, const double* axis,
                             const double* mass, const double* bcom,
                             const double* inertia, int ne,
                             const int* eff_body, const double* eff_pos,
                             const double* q, const double* v, double* com,
                             double* h, double* ee) {
  Model mdl{nj, parent, jrot, jpos, axis, mass, bcom, inertia, ne, eff_body,
            eff_pos};
  centroidal_state_and_frames(mdl, q, v, com, h, ee);
}

}  // extern "C"
