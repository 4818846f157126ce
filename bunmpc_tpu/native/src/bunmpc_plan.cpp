// Native (C++17) golden reference for the MPC PROBLEM-ASSEMBLY layer:
// the Raibert contact planner (reference examples/mpc/abstract_cyclic_gen.py
// create_cnt_plan :159-414) and the dynamics/IK cost construction
// (create_costs :532-614, optimize preamble :629-645, bound construction
// src/motion_planner/biconvex.cpp:27-57), written directly from the
// reference's loops — NOT from the repo's vectorized JAX twin — so that a
// shared misreading of the reference cannot pass both implementations
// (VERDICT round-3 task 4).
//
// From raw (q, v, t, v_des, w_des) this produces everything the solver
// consumes: contact plan (cnt, r, dt), x_init, X_ref/W/W_F cost tables,
// kinematic CoM box bounds, and the per-knot IK end-effector task targets/
// weights.  Chained with bunmpc_kinodyn_solve (bunmpc_ik.cpp) it forms a
// fully independent native pipeline from raw inputs to (X, F, xs, us).
//
// Reference quirks implemented exactly (SURVEY.md §7.5):
//   * first-knot dt shrink: dt0 = gait_dt - round2(t mod gait_dt), 0 -> gait_dt
//   * knot-0 locations are the CURRENT foot positions regardless of phase
//   * np.round(..., 3) on com_xy / knot-0 feet / ft when round3 != 0
//   * swing via flag fires for the whole first half of swing
//     (per_ph - 0.5 < 0.02, :366-368)
//   * X_nom's y row anchors at a stale buffer (0.0 on the first call,
//     :574-578) — toggleable via y_anchor so the repo's documented deviation
//     (anchor at current CoM like x) can be measured
//   * solo12 hip nudges (+-0.04 lateral, :59-69) vs generic foot offsets

#include <cmath>
#include <cstring>
#include <limits>
#include <vector>

// from bunmpc_native.cpp / bunmpc_ik.cpp (same shared library)
extern "C" int bunmpc_gait_phase(double t, double period, double offset,
                                 double stance_percent);
extern "C" double bunmpc_gait_percent_in_phase(double t, double period,
                                               double offset,
                                               double stance_percent);
extern "C" void bunmpc_centroidal_state(
    int nj, const int* parent, const double* jrot, const double* jpos,
    const double* axis, const double* mass, const double* bcom,
    const double* inertia, int ne, const int* eff_body, const double* eff_pos,
    const double* q, const double* v, double* com, double* h, double* ee);

namespace {

using std::vector;

inline double round_n(double x, int n) {
  const double s = std::pow(10.0, n);
  return std::nearbyint(x * s) / s;
}

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

// quaternion -> rotation vector (pin.log3 of the rotation)
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

// yaw-only rotation of a quaternion: pin.rpy roll/pitch zeroed
// (abstract_cyclic_gen.py:172-177, :586-589). ZYX convention: yaw =
// atan2(2(wz + xy), 1 - 2(y^2 + z^2)).
inline double quat_yaw(const double* q) {
  return std::atan2(2.0 * (q[3] * q[2] + q[0] * q[1]),
                    1.0 - 2.0 * (q[1] * q[1] + q[2] * q[2]));
}

inline void yaw_rot(double yaw, double* R) {
  const double c = std::cos(yaw), s = std::sin(yaw);
  R[0] = c; R[1] = -s; R[2] = 0;
  R[3] = s; R[4] = c;  R[5] = 0;
  R[6] = 0; R[7] = 0;  R[8] = 1;
}

inline void yaw_quat(double yaw, double* q) {
  q[0] = 0;
  q[1] = 0;
  q[2] = std::sin(0.5 * yaw);
  q[3] = std::cos(0.5 * yaw);
}

// ---- minimal FK (positions + rotations) for the composite inertia ----

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

// composite rotational inertia of the whole robot about its CoM at q
// (reference: pin.crba -> data.Ycrb[1].inertia, abstract_cyclic_gen.py:46-47)
void composite_inertia_about_com(int nj, const int* parent, const double* jrot,
                                 const double* jpos, const double* axis,
                                 const double* mass, const double* bcom,
                                 const double* inertia, const double* q,
                                 double* I_out) {
  const int nb = nj + 1;
  vector<double> R(9 * nb), p(3 * nb);
  quat_to_rot(q + 3, R.data());
  p[0] = q[0];
  p[1] = q[1];
  p[2] = q[2];
  for (int j = 0; j < nj; ++j) {
    const int b = parent[j];
    double Rr[9], Rj[9], tmp[9], off[3];
    axis_angle_rot(axis + 3 * j, q[7 + j], Rr);
    mat3_mul(jrot + 9 * j, Rr, Rj);
    mat3_mul(R.data() + 9 * b, Rj, tmp);
    std::memcpy(R.data() + 9 * (j + 1), tmp, sizeof tmp);
    mat3_vec(R.data() + 9 * b, jpos + 3 * j, off);
    for (int k = 0; k < 3; ++k) p[3 * (j + 1) + k] = p[3 * b + k] + off[k];
  }
  // total CoM
  double com[3] = {0, 0, 0}, M = 0;
  vector<double> cw(3 * nb);
  for (int b = 0; b < nb; ++b) {
    double coff[3];
    mat3_vec(R.data() + 9 * b, bcom + 3 * b, coff);
    for (int k = 0; k < 3; ++k) cw[3 * b + k] = p[3 * b + k] + coff[k];
    for (int k = 0; k < 3; ++k) com[k] += mass[b] * cw[3 * b + k];
    M += mass[b];
  }
  for (int k = 0; k < 3; ++k) com[k] /= M;
  // sum R I R^T + m (|d|^2 I - d d^T), d = body com - total com
  for (int k = 0; k < 9; ++k) I_out[k] = 0;
  for (int b = 0; b < nb; ++b) {
    double RI[9], RIRt[9];
    mat3_mul(R.data() + 9 * b, inertia + 9 * b, RI);
    // RIRt = RI * R^T
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) {
        double s = 0;
        for (int k = 0; k < 3; ++k) s += RI[3 * i + k] * R[9 * b + 3 * j + k];
        RIRt[3 * i + j] = s;
      }
    double d[3];
    for (int k = 0; k < 3; ++k) d[k] = cw[3 * b + k] - com[k];
    const double d2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2];
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j)
        I_out[3 * i + j] +=
            RIRt[3 * i + j] + mass[b] * ((i == j ? d2 : 0.0) - d[i] * d[j]);
  }
}

}  // namespace

extern "C" {

// Full problem assembly from raw (q, v, t, v_des, w_des).
// Layouts: q (nj+7) [xyz, quat xyzw, joints], v (nj+6); outputs cnt (H, ne),
// r_out (H, ne, 3), dts (H), x_init (9), W_out/X_ref/lb_x/ub_x ((H+1), 9),
// W_F_out (H, ne, 3), ee_wts (ik_hor, ne), ee_targets (ik_hor, ne, 3).
// use_hip_nudges: 1 = solo12 hip-offset style (+-0.04 lateral nudges on hip
// frames), 0 = generic (foot - com, no nudges).  round3: apply the
// reference's np.round(...,3) to com/feet/ft.  y_anchor: value the X_nom y
// row cumulates from (reference first call: 0.0).
void bunmpc_prepare_problem(
    int nj, const int* parent, const double* jrot, const double* jpos,
    const double* axis, const double* mass, const double* bcom,
    const double* inertia, int ne, const int* eff_body, const double* eff_pos,
    const int* hip_body, const double* hip_pos, const double* q0,
    int use_hip_nudges, double foot_size, double gait_period, double gait_dt,
    const double* stance_percent, const double* phase_offset, double step_ht,
    double nom_ht, double gait_horizon, const double* W_X,
    const double* W_X_ter, const double* W_F, const double* ori_correction,
    double swing_wt0, double swing_wt1, double bx, double by, double bz,
    int H, int ik_hor, int round3, double y_anchor,
    const double* q_in, const double* v_in, double t, const double* v_des_in,
    double w_des,
    double* cnt, double* r_out, double* dts, double* x_init, double* W_out,
    double* X_ref, double* W_F_out, double* lb_x, double* ub_x,
    double* ee_wts, double* ee_targets) {
  const int nq = nj + 7;
  const int nv = nj + 6;
  const double GRAV = 9.81;
  const double INF = std::numeric_limits<double>::infinity();

  // --- planning offsets at q0 (abstract_cyclic_gen.py:51-76 /
  // abstract_cyclic_gen1.py:50-65) ---
  vector<double> offsets(3 * ne);
  {
    vector<double> com0(3), h0(6), frames(3 * ne), zero_v(nv, 0.0);
    const int* fb = use_hip_nudges ? hip_body : eff_body;
    const double* fp = use_hip_nudges ? hip_pos : eff_pos;
    bunmpc_centroidal_state(nj, parent, jrot, jpos, axis, mass, bcom, inertia,
                            ne, fb, fp, q0, zero_v.data(), com0.data(),
                            h0.data(), frames.data());
    for (int j = 0; j < ne; ++j)
      for (int k = 0; k < 3; ++k)
        offsets[3 * j + k] = round_n(frames[3 * j + k] - com0[k], 3);
    if (use_hip_nudges) {
      // Solo12 stance-widening nudges (:59-69); ordering FL, FR, HL, HR
      offsets[3 * 0 + 1] += 0.04;
      offsets[3 * 1 + 1] -= 0.04;
      offsets[3 * 2 + 1] += 0.04;
      offsets[3 * 3 + 1] -= 0.04;
    }
    // rotate into the base frame: offsets[i] = R0^T offsets[i] (:72-76)
    double R0[9];
    quat_to_rot(q0 + 3, R0);
    for (int j = 0; j < ne; ++j) {
      double o[3];
      mat3T_vec(R0, offsets.data() + 3 * j, o);
      std::memcpy(offsets.data() + 3 * j, o, sizeof o);
    }
  }

  // --- composite inertia (yaw-momentum target) ---
  double I_comp[9];
  composite_inertia_about_com(nj, parent, jrot, jpos, axis, mass, bcom,
                              inertia, q0, I_comp);

  // --- optimize() preamble: origin reset + local v_des (:632-643) ---
  vector<double> q(q_in, q_in + nq);
  q[0] = 0.0;
  q[1] = 0.0;
  double Rfull[9], v_des[3];
  quat_to_rot(q.data() + 3, Rfull);
  mat3_vec(Rfull, v_des_in, v_des);

  // --- current centroidal state + foot positions ---
  vector<double> com(3), h(6), ee(3 * ne);
  double m_total = 0;
  for (int b = 0; b <= nj; ++b) m_total += mass[b];
  bunmpc_centroidal_state(nj, parent, jrot, jpos, axis, mass, bcom, inertia,
                          ne, eff_body, eff_pos, q.data(), v_in, com.data(),
                          h.data(), ee.data());
  x_init[0] = com[0];
  x_init[1] = com[1];
  x_init[2] = com[2];
  for (int k = 0; k < 3; ++k) x_init[3 + k] = h[k] / m_total;
  for (int k = 0; k < 3; ++k) x_init[6 + k] = h[3 + k];

  // --- create_cnt_plan (:159-414) ---
  const double com_x = round3 ? round_n(com[0], 3) : com[0];
  const double com_y = round3 ? round_n(com[1], 3) : com[1];
  const double z_height = com[2];
  double Ryaw[9];
  yaw_rot(quat_yaw(q.data() + 3), Ryaw);
  const double vtrack[2] = {v_des[0], v_des[1]};
  // ang_step = cross([a0, a1, 0], [0, 0, w]) = [a1 w, -a0 w, 0]
  const double afac = 0.5 * std::sqrt(z_height / GRAV);
  const double ang_step[2] = {afac * vtrack[1] * w_des,
                              -afac * vtrack[0] * w_des};

  vector<double> swing_time(H * ne, 0.0);
  for (int i = 0; i < H; ++i) {
    const double ft_raw = t + i * gait_dt;
    const double ft = round3 ? round_n(ft_raw, 3) : ft_raw;
    for (int j = 0; j < ne; ++j) {
      const int phase = bunmpc_gait_phase(i == 0 ? t : ft, gait_period,
                                          phase_offset[j], stance_percent[j]);
      double* r_ij = r_out + 3 * (i * ne + j);
      if (i == 0) {
        // knot 0: current foot position regardless of phase (:205-255)
        cnt[i * ne + j] = phase;
        for (int k = 0; k < 3; ++k)
          r_ij[k] = round3 ? round_n(ee[3 * j + k], 3) : ee[3 * j + k];
        continue;
      }
      double hip_loc[2], off_w[3];
      mat3_vec(Ryaw, offsets.data() + 3 * j, off_w);
      hip_loc[0] = com_x + off_w[0] + i * gait_dt * vtrack[0];
      hip_loc[1] = com_y + off_w[1] + i * gait_dt * vtrack[1];
      const double raibert[2] = {
          0.5 * vtrack[0] * gait_period * stance_percent[j],
          0.5 * vtrack[1] * gait_period * stance_percent[j]};
      if (phase == 1) {
        cnt[i * ne + j] = 1;
        if (cnt[(i - 1) * ne + j] == 1.0) {
          // still in contact: location frozen at touchdown (:270-273)
          std::memcpy(r_ij, r_out + 3 * ((i - 1) * ne + j), 3 * sizeof(double));
        } else {
          r_ij[0] = raibert[0] + hip_loc[0] + ang_step[0];
          r_ij[1] = raibert[1] + hip_loc[1] + ang_step[1];
          r_ij[2] = foot_size;  // flat ground (:332-336)
        }
      } else {
        cnt[i * ne + j] = 0;
        double per_ph = bunmpc_gait_percent_in_phase(
            ft, gait_period, phase_offset[j], stance_percent[j]);
        if (round3) per_ph = round_n(per_ph, 3);
        if (per_ph < 0.5) {
          r_ij[0] = hip_loc[0] + ang_step[0];
          r_ij[1] = hip_loc[1] + ang_step[1];
        } else {
          r_ij[0] = hip_loc[0] + ang_step[0] + raibert[0];
          r_ij[1] = hip_loc[1] + ang_step[1] + raibert[1];
        }
        // via flag fires for the entire first half of swing (:366-368)
        if (per_ph - 0.5 < 0.02) swing_time[i * ne + j] = 1.0;
        r_ij[2] = foot_size;
      }
    }
    // dt schedule (:385-390): first knot shrinks to the next knot boundary
    if (i == 0) {
      double dt0 = gait_dt - round_n(std::fmod(t, gait_dt), 2);
      dts[i] = (dt0 == 0.0) ? gait_dt : dt0;
    } else {
      dts[i] = gait_dt;
    }
  }

  // --- create_costs: dynamics part (:566-614) ---
  vector<double> X_nom(9 * H, 0.0);
  X_nom[0] = x_init[0];
  X_nom[1] = y_anchor;
  for (int i = 1; i < H; ++i) {
    X_nom[9 * i + 0] = X_nom[9 * (i - 1) + 0] + v_des[0] * dts[i];
    X_nom[9 * i + 1] = X_nom[9 * (i - 1) + 1] + v_des[1] * dts[i];
  }
  for (int i = 0; i < H; ++i) {
    X_nom[9 * i + 2] = nom_ht;
    X_nom[9 * i + 3] = v_des[0];
    X_nom[9 * i + 4] = v_des[1];
    X_nom[9 * i + 5] = v_des[2];
  }
  // orientation correction (:586-607, compute_ori_correction :616-627)
  double ori_des[4];
  if (w_des != 0.0) {
    std::memcpy(ori_des, q.data() + 3, sizeof ori_des);
  } else {
    ori_des[0] = ori_des[1] = ori_des[2] = 0.0;
    ori_des[3] = 1.0;
  }
  double des_yaw_q[4], q_inv[4] = {-q[3], -q[4], -q[5], q[6]}, rel[4], amom[3];
  yaw_quat(quat_yaw(ori_des), des_yaw_q);
  quat_mul(des_yaw_q, q_inv, rel);
  log3_quat(rel, amom);
  const double yaw_mom =
      (I_comp[6] * 0.0 + I_comp[7] * 0.0 + I_comp[8] * w_des);
  for (int i = 0; i < H; ++i) {
    X_nom[9 * i + 6] = amom[0] * ori_correction[0];
    X_nom[9 * i + 7] = amom[1] * ori_correction[1];
    X_nom[9 * i + 8] =
        (w_des == 0.0) ? amom[2] * ori_correction[2] : yaw_mom;
  }
  double X_ter[9] = {0, 0, 0, 0, 0, 0, 0, 0, 0};
  X_ter[0] = x_init[0] + gait_horizon * gait_period * v_des[0];
  X_ter[1] = x_init[1] + gait_horizon * gait_period * v_des[1];
  X_ter[2] = nom_ht;
  X_ter[3] = v_des[0];
  X_ter[4] = v_des[1];
  X_ter[5] = v_des[2];
  X_ter[6] = amom[0];
  X_ter[7] = amom[1];
  X_ter[8] = (w_des == 0.0) ? amom[2] : yaw_mom;
  std::memcpy(X_ref, X_nom.data(), sizeof(double) * 9 * H);
  std::memcpy(X_ref + 9 * H, X_ter, sizeof X_ter);
  for (int i = 0; i < H; ++i)
    std::memcpy(W_out + 9 * i, W_X, 9 * sizeof(double));
  std::memcpy(W_out + 9 * H, W_X_ter, 9 * sizeof(double));
  std::memcpy(W_F_out, W_F, 3 * ne * sizeof(double));
  for (int i = 1; i < H; ++i)
    std::memcpy(W_F_out + 3 * ne * i, W_F, 3 * ne * sizeof(double));

  // --- kinematic CoM box (biconvex.cpp:27-57): active where any contact ---
  for (int i = 0; i <= H; ++i)
    for (int k = 0; k < 9; ++k) {
      lb_x[9 * i + k] = -INF;
      ub_x[9 * i + k] = INF;
    }
  const double b_lo[3] = {-bx, -by, 0.0}, b_hi[3] = {bx, by, bz};
  for (int i = 0; i < H; ++i) {
    double csum = 0;
    for (int j = 0; j < ne; ++j) csum += cnt[i * ne + j];
    if (csum <= 0) continue;
    for (int k = 0; k < 3; ++k) {
      double mx = -INF, mn = INF;
      for (int j = 0; j < ne; ++j) {
        const double rv = r_out[3 * (i * ne + j) + k];
        mx = std::fmax(mx, rv);
        mn = std::fmin(mn, rv);
      }
      lb_x[9 * i + k] = mx + b_lo[k];
      ub_x[9 * i + k] = mn + b_hi[k];
    }
  }

  // --- create_costs: IK end-effector tasks (:545-554) ---
  for (int i = 0; i < ik_hor; ++i)
    for (int j = 0; j < ne; ++j) {
      double* tgt = ee_targets + 3 * (i * ne + j);
      std::memcpy(tgt, r_out + 3 * (i * ne + j), 3 * sizeof(double));
      if (cnt[i * ne + j] == 1.0) {
        ee_wts[i * ne + j] = swing_wt0;
      } else if (swing_time[i * ne + j] == 1.0) {
        ee_wts[i * ne + j] = swing_wt1;
        tgt[2] = step_ht;  // via point at absolute step height (:551-553)
      } else {
        ee_wts[i * ne + j] = 0.0;
      }
    }
}

}  // extern "C"
