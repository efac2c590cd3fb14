// Independent serial implementation of the reference point-location +
// interpolation algorithm (m_interp_unstructured.f90), written from the
// algorithm description — NOT a transcription of either the Fortran or
// the JAX implementation.  It serves two purposes:
//
//  1. Cross-validation oracle: the JAX candidate/walk/brute paths are
//     checked against this code at 1e-12 (tests/test_serial_oracle.py),
//     giving an INDEPENDENT implementation of the same math — the
//     strongest substitute available for running the (unbuildable here)
//     Fortran binaries themselves.
//  2. Compiled single-core baseline: benchmark.f90's protocol timed on
//     one CPU core through optimized native code — a fair stand-in for
//     the Fortran serial denominator in bench.py's speedup_vs_serial
//     (the pure-numpy walk understates compiled serial code).
//
// Algorithm parity map (reference file:line):
//  * face normals & conventions .... m_interp_unstructured.f90:306-370
//    (face k holds vertex k; tri edge k = (k, k+1); tet face k =
//     (k, k+1, k+2); outward sign fixed against the cell center)
//  * cell volumes .................. :372-410
//  * nearest-point seed ............ :272-288 (kd-tree there; exact
//    brute-force 1-NN + first-incident-cell map here — same semantics)
//  * walk .......................... :664-725 (iu_get_cell_through_
//    neighbors) with :736-763 (get_cell_intersection)
//  * triangle weights .............. :529-551
//  * tetra weights ................. :553-586
//  * field-line tracer ............. :987-1217 (iu_integrate_along_
//    field: Bogacki-Shampine RK23 on the field's unit vector, the
//    embedded 2nd-order error estimate, boundary shrink-and-retry,
//    icell-mask region restriction, axisymmetric radius clamp)
//
// Build: g++ -O3 -march=native -shared -fPIC serial_oracle.cc -o ...
// (driven by interpolate_unstructured_tpu/utils/serial_oracle.py).

#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct V3 {
  double x, y, z;
};

inline V3 sub(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline double dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
          a.x * b.y - a.y * b.x};
}
inline double norm(V3 a) { return std::sqrt(dot(a, a)); }

struct Mesh {
  int npc;            // points per cell: 3 = triangle, 4 = quad/tetra
  bool is_quad;       // npc == 4 planar quad (vs tetra)
  int n_points, n_cells;
  const double* points;     // (n_points, 3)
  const int32_t* cells;     // (n_cells, npc)
  const int32_t* neighbors; // (n_cells, npc); face k, -1 = boundary

  std::vector<V3> cell_pts;      // (n_cells * npc)
  std::vector<V3> face_normals;  // (n_cells * npc), unit, outward
  std::vector<double> volume;    // (n_cells)
  std::vector<int32_t> point_cell;  // first cell incident to each point

  V3 pt(int i) const {
    return {points[3 * i], points[3 * i + 1], points[3 * i + 2]};
  }
  V3 cp(int c, int k) const { return cell_pts[c * npc + k]; }

  void build() {
    cell_pts.resize((size_t)n_cells * npc);
    face_normals.resize((size_t)n_cells * npc);
    volume.resize(n_cells);
    point_cell.assign(n_points, -1);
    for (int c = 0; c < n_cells; ++c) {
      for (int k = 0; k < npc; ++k) {
        int32_t ip = cells[(size_t)c * npc + k];
        cell_pts[(size_t)c * npc + k] = pt(ip);
        if (point_cell[ip] < 0) point_cell[ip] = c;
      }
      V3 center{0, 0, 0};
      for (int k = 0; k < npc; ++k) {
        V3 p = cp(c, k);
        center.x += p.x; center.y += p.y; center.z += p.z;
      }
      center.x /= npc; center.y /= npc; center.z /= npc;
      if (npc == 3 || is_quad) {
        // flat-cell normal, then edge x cell-normal, outward-flipped
        // (reference :317-343, one branch for triangle and quad)
        V3 nc = cross(sub(cp(c, 1), cp(c, 0)), sub(cp(c, 2), cp(c, 1)));
        for (int k = 0; k < npc; ++k) {
          int k1 = (k + 1) % npc;
          V3 nf = cross(sub(cp(c, k1), cp(c, k)), nc);
          if (dot(sub(cp(c, k), center), nf) < 0)
            nf = {-nf.x, -nf.y, -nf.z};
          double s = 1.0 / norm(nf);
          face_normals[(size_t)c * npc + k] = {nf.x * s, nf.y * s, nf.z * s};
        }
        volume[c] =
            0.5 * norm(cross(sub(cp(c, 1), cp(c, 0)), sub(cp(c, 2), cp(c, 0))));
        if (is_quad)
          volume[c] += 0.5 * norm(cross(sub(cp(c, 2), cp(c, 0)),
                                        sub(cp(c, 3), cp(c, 0))));
      } else {
        for (int k = 0; k < 4; ++k) {
          int k1 = (k + 1) % 4, k2 = (k + 2) % 4;
          V3 nf = cross(sub(cp(c, k1), cp(c, k)), sub(cp(c, k2), cp(c, k1)));
          if (dot(sub(cp(c, k), center), nf) < 0)
            nf = {-nf.x, -nf.y, -nf.z};
          double s = 1.0 / norm(nf);
          face_normals[(size_t)c * 4 + k] = {nf.x * s, nf.y * s, nf.z * s};
        }
        volume[c] = dot(sub(cp(c, 1), cp(c, 0)),
                        cross(sub(cp(c, 2), cp(c, 0)),
                              sub(cp(c, 3), cp(c, 0)))) / 6.0;
      }
    }
  }

  // Nearest-point seed cell (reference seeds from the kd-tree's nearest
  // point, :272-288; exact brute-force 1-NN gives the same point).
  int seed_cell(V3 r) const {
    int best = 0;
    double best_d = 1e300;
    for (int i = 0; i < n_points; ++i) {
      V3 d = sub(pt(i), r);
      double dd = dot(d, d);
      if (dd < best_d) { best_d = dd; best = i; }
    }
    return point_cell[best];
  }

  // iu_get_cell_through_neighbors (:664-725): walk the straight segment
  // r0 -> r1 from cell ic0, crossing exit faces (:736-763).  Status 0 =
  // r1 reached, -1 = left the domain, 1 = the icell mask changed
  // (:706-719).  On early exit *r_p is the face-intersection point (the
  // tracer shrinks its step to |r_p - r0|, :1084); on status 0 it is r1.
  int walk_ex(V3 r0, V3 r1, int ic0, int max_steps,
              const int32_t* icell_mask, V3* r_p, int* status) const {
    *status = 0;
    V3 d = sub(r1, r0);
    double distance_left = norm(d);
    if (distance_left < 1e-100) {  // tiny_distance short-circuit (:689)
      *r_p = r1;
      return ic0;
    }
    double inv = 1.0 / distance_left;
    V3 u{d.x * inv, d.y * inv, d.z * inv};
    V3 rp = r0;
    int ic = ic0;
    for (int step = 0; step < max_steps; ++step) {
      // exit face: min distance over faces whose normal points along u
      double face_distance = 1e100;
      int i_face = -1;
      for (int k = 0; k < npc; ++k) {
        V3 nf = face_normals[(size_t)ic * npc + k];
        double pn = dot(u, nf);
        if (pn > 0) {
          double dist = dot(sub(cp(ic, k), rp), nf) / pn;
          if (dist < face_distance) { face_distance = dist; i_face = k; }
        }
      }
      if (i_face < 0) { *r_p = r1; return ic; }  // degenerate; stop here
      rp.x += face_distance * u.x;
      rp.y += face_distance * u.y;
      rp.z += face_distance * u.z;
      distance_left -= face_distance;
      if (distance_left > 0) {
        int nb = neighbors[(size_t)ic * npc + i_face];
        if (nb < 0) {  // left the domain (status -1)
          *status = -1;
          *r_p = rp;
          return nb;
        }
        ic = nb;
        if (icell_mask && icell_mask[ic] != icell_mask[ic0]) {
          *status = 1;  // mask changed vs the START cell (:712-719)
          *r_p = rp;
          return ic;
        }
      } else {
        *r_p = r1;
        return ic;  // r1 reached inside the current cell (status 0)
      }
    }
    *r_p = rp;
    return ic;
  }

  int walk(V3 r0, V3 r1, int ic0, int max_steps) const {
    V3 rp;
    int status;
    int ic = walk_ex(r0, r1, ic0, max_steps, nullptr, &rp, &status);
    return status == 0 ? ic : -1;
  }

  // interpolate_quad (:588-641): inverse-bilinear coefficients via the
  // reference's quadratic (same root, linear fallback at |A| < 1e-20,
  // first-occurrence maxloc over |denom|), evaluated naively — exact
  // enough in f64; the JAX kernel's cancellation-free rewrite exists
  // for f32.
  double interpolate_quad(int c, V3 r, const double* data) const {
    const int32_t* cv = cells + (size_t)c * 4;
    V3 q = sub(r, cp(c, 0));
    V3 b1 = sub(cp(c, 1), cp(c, 0));
    V3 b2 = sub(cp(c, 3), cp(c, 0));
    V3 b3 = {cp(c, 0).x - cp(c, 1).x - cp(c, 3).x + cp(c, 2).x,
             cp(c, 0).y - cp(c, 1).y - cp(c, 3).y + cp(c, 2).y,
             cp(c, 0).z - cp(c, 1).z - cp(c, 3).z + cp(c, 2).z};
    auto cpz = [](V3 a, V3 b) { return a.x * b.y - a.y * b.x; };
    double A = cpz(b2, b3);
    double B = cpz(b3, q) - cpz(b1, b2);
    double C = cpz(b1, q);
    double mu;
    if (std::fabs(A) < 1e-20) {
      mu = -C / B;
    } else {
      mu = 0.5 * (-B - std::sqrt(B * B - 4 * A * C)) / A;
    }
    double den[3] = {b1.x + mu * b3.x, b1.y + mu * b3.y, b1.z + mu * b3.z};
    double qc[3] = {q.x, q.y, q.z};
    double bc[3] = {b2.x, b2.y, b2.z};
    int dim = 0;  // first-occurrence maxloc (Fortran maxloc semantics)
    for (int d = 1; d < 3; ++d)
      if (std::fabs(den[d]) > std::fabs(den[dim])) dim = d;
    double lam = (qc[dim] - bc[dim] * mu) / den[dim];
    double t1 = data[cv[0]] * (1 - lam) + data[cv[1]] * lam;
    double t2 = data[cv[3]] * (1 - lam) + data[cv[2]] * lam;
    return t1 * (1 - mu) + t2 * mu;
  }

  // interpolate_triangle (:529-551) / interpolate_tetrahedron (:553-586)
  double interpolate(int c, V3 r, const double* data) const {
    if (is_quad) return interpolate_quad(c, r, data);
    const int32_t* cv = cells + (size_t)c * npc;
    if (npc == 3) {
      double w0 = 0.5 * norm(cross(sub(r, cp(c, 1)), sub(r, cp(c, 2))));
      double w1 = 0.5 * norm(cross(sub(r, cp(c, 2)), sub(r, cp(c, 0))));
      double w2 = 0.5 * norm(cross(sub(r, cp(c, 0)), sub(r, cp(c, 1))));
      double s = 1.0 / volume[c];
      return (w0 * data[cv[0]] + w1 * data[cv[1]] + w2 * data[cv[2]]) * s;
    }
    V3 v1r = sub(r, cp(c, 0)), v2r = sub(r, cp(c, 1));
    double w0 = dot(v2r, cross(sub(cp(c, 3), cp(c, 1)), sub(cp(c, 2), cp(c, 1))));
    double w1 = dot(v1r, cross(sub(cp(c, 2), cp(c, 0)), sub(cp(c, 3), cp(c, 0))));
    double w2 = dot(v1r, cross(sub(cp(c, 3), cp(c, 0)), sub(cp(c, 1), cp(c, 0))));
    double w3 = dot(v1r, cross(sub(cp(c, 1), cp(c, 0)), sub(cp(c, 2), cp(c, 0))));
    double s = 1.0 / (6.0 * volume[c]);
    return (w0 * data[cv[0]] + w1 * data[cv[1]] + w2 * data[cv[2]] +
            w3 * data[cv[3]]) * s;
  }
};

}  // namespace

extern "C" {

// One serial query pass over n_q points.  guesses == nullptr => cold
// (nearest-point seed per query, like the reference's kd-tree path);
// otherwise guesses[i] >= 0 warm-starts the walk from that cell (its
// centroid, iu_get_cell :428-433).  Outputs: out_vals (fill 0 on miss),
// out_ic (-1 on miss), out_found (0/1).
void iu_serial_query(int npc, int is_quad, int n_points, int n_cells,
                     const double* points, const int32_t* cells,
                     const int32_t* neighbors, const double* point_data,
                     int n_q, const double* queries,
                     const int32_t* guesses, int max_steps,
                     double* out_vals, int32_t* out_ic,
                     uint8_t* out_found) {
  Mesh m;
  m.npc = npc;
  m.is_quad = is_quad != 0;
  m.n_points = n_points;
  m.n_cells = n_cells;
  m.points = points;
  m.cells = cells;
  m.neighbors = neighbors;
  m.build();
  for (int i = 0; i < n_q; ++i) {
    V3 r{queries[3 * i], queries[3 * i + 1], queries[3 * i + 2]};
    int ic0 = (guesses && guesses[i] >= 0 && guesses[i] < n_cells)
                  ? guesses[i]
                  : m.seed_cell(r);
    // start from the seed cell's centroid (iu_get_cell :428-433)
    V3 c0{0, 0, 0};
    for (int k = 0; k < npc; ++k) {
      V3 p = m.cp(ic0, k);
      c0.x += p.x; c0.y += p.y; c0.z += p.z;
    }
    c0.x /= npc; c0.y /= npc; c0.z /= npc;
    int ic = m.walk(c0, r, ic0, max_steps);
    if (ic >= 0) {
      out_vals[i] = m.interpolate(ic, r, point_data);
      out_ic[i] = ic;
      out_found[i] = 1;
    } else {
      out_vals[i] = 0.0;
      out_ic[i] = -1;
      out_found[i] = 0;
    }
  }
}

// Serial field-line tracer: iu_integrate_along_field (:987-1217), the
// adaptive Bogacki-Shampine RK23 along the unit vector of the
// interpolated field.  Control flow mirrors the reference exactly:
//  * k1 reuses the stored field of the last accepted point (:1109);
//  * every sub-step walks the segment anchor -> target starting from
//    the anchor's cell (:1122, :1135, :1150);
//  * a failed walk (status != 0) restarts the iteration with
//    dx = (1 - 1e-8) * |r_p - anchor| (:1081-1084) and terminates with
//    a boundary code once dx < min_dx (:1086-1096);
//  * scales = atol + max(|y3|,|y2|)*rtol, err = sqrt(sum(sq)/3)
//    (:1162-1163); accept if err <= 1 or dx < 2*min_dx (:1165);
//  * dx *= min(max_growth, 0.8*err^(-1/3)) clamped to [min_dx, max_dx],
//    growth 1x if a step was rejected at this or the previous
//    iteration, else 2x (:1178-1188);
//  * axisymmetric clamps the first coordinate >= 1e-12 (:1120 etc).
//
// field: (ndim, n_points) component-major vertex data.  The nvar extra
// variables integrate d(var)/ds = 1 (arc length) — the reference
// test's sub_int (test_trace_field.f90:57-64).  Outputs per
// trajectory: out_y (max_steps, ndim+nvar) with [0] = y0, out_yfield
// (max_steps, ndim), out_nsteps (stored points; max_steps+1 = buffer
// filled before a boundary), out_bm (-1 physical boundary, mask value,
// -2 not reached).
void iu_serial_trace(int npc, int is_quad, int n_points, int n_cells,
                     const double* points, const int32_t* cells,
                     const int32_t* neighbors, int ndim,
                     const double* field_data, int nvar,
                     double min_dx, double max_dx, int max_steps,
                     double rtol, double atol, int reverse,
                     int axisymmetric, const int32_t* icell_mask,
                     int mask_value, int n_traj, const double* y0,
                     int max_iterations, double* out_y,
                     double* out_yfield, int32_t* out_nsteps,
                     int32_t* out_bm) {
  Mesh m;
  m.npc = npc;
  m.is_quad = is_quad != 0;
  m.n_points = n_points;
  m.n_cells = n_cells;
  m.points = points;
  m.cells = cells;
  m.neighbors = neighbors;
  m.build();

  const int D = ndim + nvar;
  const double min_radius = 1e-12, eps = 1e-8, safety_fac = 0.8;
  std::vector<double> y(D), ys(D), y2nd(D), k(4 * D);

  auto interp_vec = [&](int c, V3 r, double* out) {
    for (int d = 0; d < ndim; ++d)
      out[d] = m.interpolate(c, r, field_data + (size_t)d * n_points);
  };
  // get_unitvec (:1193-1201) + the nvar arc-length derivatives
  auto deriv = [&](const double* field, double* kd) {
    double n2 = 0;
    for (int d = 0; d < ndim; ++d) n2 += field[d] * field[d];
    double s = (reverse ? -1.0 : 1.0) / std::sqrt(n2);
    for (int d = 0; d < ndim; ++d) kd[d] = field[d] * s;
    for (int v = ndim; v < D; ++v) kd[v] = 1.0;
  };

  for (int t = 0; t < n_traj; ++t) {
    double* ty = out_y + (size_t)t * max_steps * D;
    double* tf = out_yfield + (size_t)t * max_steps * ndim;
    for (int i = 0; i < max_steps * D; ++i) ty[i] = 0.0;
    for (int i = 0; i < max_steps * ndim; ++i) tf[i] = 0.0;
    for (int d = 0; d < D; ++d) y[d] = y0[(size_t)t * D + d];
    for (int d = 0; d < D; ++d) ty[d] = y[d];
    out_bm[t] = -2;
    out_nsteps[t] = 1;

    V3 r0{y[0], y[1], ndim > 2 ? y[2] : 0.0};
    // cold locate of the start cell (iu_interpolate_at with i_cell = 0:
    // nearest-point seed + walk from the seed cell's centroid, :414-434)
    int ic0 = m.seed_cell(r0);
    V3 c0{0, 0, 0};
    for (int kk = 0; kk < npc; ++kk) {
      V3 p = m.cp(ic0, kk);
      c0.x += p.x; c0.y += p.y; c0.z += p.z;
    }
    c0.x /= npc; c0.y /= npc; c0.z /= npc;
    int i_cell = m.walk(c0, r0, ic0, 100000);
    // invalid start: boundary code and exit (:1055-1068)
    if (i_cell < 0 || (icell_mask && icell_mask[i_cell] != mask_value)) {
      out_bm[t] = i_cell < 0 ? -1 : icell_mask[i_cell];
      continue;
    }
    double field[3] = {0, 0, 0};
    interp_vec(i_cell, r0, field);
    for (int d = 0; d < ndim; ++d) tf[d] = field[d];

    int n_steps = 1, i_cell_prev = i_cell, last_rejected = -100;
    int status = 0;
    double dx = max_dx;
    V3 r_p{0, 0, 0};
    bool done = false;

    for (int iteration = 1; iteration <= max_iterations && !done;
         ++iteration) {
      const double* anchor = ty + (size_t)(n_steps - 1) * D;
      r0 = {anchor[0], anchor[1], ndim > 2 ? anchor[2] : 0.0};

      if (status != 0) {
        // previous iteration's walk stopped early: shrink and retry
        // (:1081-1097).  i_cell still holds that walk's output cell.
        last_rejected = iteration - 1;
        dx = (1 - eps) * norm(sub(r_p, r0));
        if (dx < min_dx) {
          out_bm[t] = i_cell < 0 ? -1
                                 : (icell_mask ? icell_mask[i_cell] : -1);
          done = true;
          break;
        }
      }
      i_cell = i_cell_prev;

      // k1 from the stored field (:1109-1115)
      const double* fprev = tf + (size_t)(n_steps - 1) * ndim;
      double f3[3] = {fprev[0], ndim > 1 ? fprev[1] : 0.0,
                      ndim > 2 ? fprev[2] : 0.0};
      deriv(f3, &k[0]);

      // sub-steps 2 (0.5*dx*k1), 3 (0.75*dx*k2), 4 at the 3rd-order
      // update (:1117-1156); each walks anchor -> target from the
      // anchor's cell
      static const double coeff[2] = {0.5, 0.75};
      bool failed = false;
      for (int s = 1; s < 4 && !failed; ++s) {
        if (s < 3) {
          for (int d = 0; d < D; ++d)
            ys[d] = anchor[d] + coeff[s - 1] * dx * k[(s - 1) * D + d];
        } else {
          for (int d = 0; d < D; ++d)
            ys[d] = anchor[d] + dx / 9.0 *
                (2 * k[d] + 3 * k[D + d] + 4 * k[2 * D + d]);
        }
        V3 r{ys[0], ys[1], ndim > 2 ? ys[2] : 0.0};
        if (axisymmetric && r.x < min_radius) r.x = min_radius;
        i_cell = m.walk_ex(r0, r, i_cell_prev, 100000, icell_mask,
                           &r_p, &status);
        if (status != 0) { failed = true; break; }
        interp_vec(i_cell, r, f3);
        deriv(f3, &k[s * D]);
      }
      if (failed) continue;  // handled at the top of the next iteration

      // embedded 2nd-order estimate + error norm (:1159-1163)
      for (int d = 0; d < D; ++d)
        y2nd[d] = anchor[d] + dx / 24.0 *
            (7 * k[d] + 6 * k[D + d] + 8 * k[2 * D + d] + 3 * k[3 * D + d]);
      double err2 = 0;
      for (int d = 0; d < D; ++d) {
        double sc = atol +
            std::max(std::fabs(ys[d]), std::fabs(y2nd[d])) * rtol;
        double e = (ys[d] - y2nd[d]) / sc;
        err2 += e * e;
      }
      double err = std::sqrt(err2 / 3.0);

      if (err <= 1.0 || dx < 2 * min_dx) {  // accept (:1165-1173)
        ++n_steps;
        if (n_steps > max_steps) {
          out_nsteps[t] = max_steps + 1;  // buffer filled (:1167-1168)
          done = true;
          break;
        }
        double* row = ty + (size_t)(n_steps - 1) * D;
        for (int d = 0; d < D; ++d) row[d] = ys[d];
        if (axisymmetric && row[0] < min_radius) row[0] = min_radius;
        for (int d = 0; d < ndim; ++d)
          tf[(size_t)(n_steps - 1) * ndim + d] = f3[d];
        i_cell_prev = i_cell;
        out_nsteps[t] = n_steps;
      } else {
        last_rejected = iteration;
      }

      // step-size control (:1178-1188)
      double max_growth = last_rejected > iteration - 2 ? 1.0 : 2.0;
      double dx_factor =
          err > 0 ? std::min(max_growth,
                             safety_fac * std::pow(1.0 / err, 1.0 / 3.0))
                  : max_growth;
      dx = std::max(min_dx, std::min(max_dx, dx * dx_factor));
    }
  }
}

}  // extern "C"
