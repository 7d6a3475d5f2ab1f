// Native host runtime for uf3_tpu: fast data loading and neighbor
// construction (the reference's compiled code lives in numba kernels and
// the upstream LAMMPS C++ pair style; here the host-side hot paths are
// C++ with a C ABI consumed through ctypes).
//
//  * extxyz bulk parser: single-pass tokenizer for large trajectory
//    files (the w-14.xyz training-set use case).
//  * cell-list neighbor counter/builder: O(N) binning used to size
//    padded capacities and to prebuild host neighbor arrays.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libuf3native.so
//        uf3_native.cpp

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// extxyz parsing
// ---------------------------------------------------------------------
// Layout of results: the parser fills flat arrays owned by a
// heap-allocated result object; the Python side copies and frees.
struct XyzResult {
  int64_t n_frames;
  int64_t n_atoms_total;
  int64_t* frame_sizes;     // (n_frames)
  double* positions;        // (n_atoms_total, 3)
  double* forces;           // (n_atoms_total, 3) or nullptr
  int64_t* numbers;         // (n_atoms_total)
  double* energies;         // (n_frames), NaN if absent
  double* cells;            // (n_frames, 9), zeros if absent
  uint8_t has_forces;
};

static const char* kSymbols[] = {
    "X",  "H",  "He", "Li", "Be", "B",  "C",  "N",  "O",  "F",  "Ne", "Na",
    "Mg", "Al", "Si", "P",  "S",  "Cl", "Ar", "K",  "Ca", "Sc", "Ti", "V",
    "Cr", "Mn", "Fe", "Co", "Ni", "Cu", "Zn", "Ga", "Ge", "As", "Se", "Br",
    "Kr", "Rb", "Sr", "Y",  "Zr", "Nb", "Mo", "Tc", "Ru", "Rh", "Pd", "Ag",
    "Cd", "In", "Sn", "Sb", "Te", "I",  "Xe", "Cs", "Ba", "La", "Ce", "Pr",
    "Nd", "Pm", "Sm", "Eu", "Gd", "Tb", "Dy", "Ho", "Er", "Tm", "Yb", "Lu",
    "Hf", "Ta", "W",  "Re", "Os", "Ir", "Pt", "Au", "Hg", "Tl", "Pb", "Bi",
    "Po", "At", "Rn", "Fr", "Ra", "Ac", "Th", "Pa", "U",  "Np", "Pu", "Am",
    "Cm", "Bk", "Cf", "Es", "Fm", "Md", "No", "Lr"};

static int64_t symbol_to_z(const char* s, size_t len) {
  for (int64_t z = 0; z < (int64_t)(sizeof(kSymbols) / sizeof(char*)); ++z) {
    if (strlen(kSymbols[z]) == len && strncmp(kSymbols[z], s, len) == 0)
      return z;
  }
  return -1;
}

// find `key=` in the comment line; returns value span (quote-aware)
static bool find_key(const std::string& line, const char* key,
                     size_t* start, size_t* end) {
  std::string pattern = std::string(key) + "=";
  size_t pos = 0;
  while (true) {
    pos = line.find(pattern, pos);
    if (pos == std::string::npos) return false;
    if (pos == 0 || line[pos - 1] == ' ' || line[pos - 1] == '\t') break;
    pos += 1;
  }
  size_t v = pos + pattern.size();
  if (v < line.size() && line[v] == '"') {
    size_t close = line.find('"', v + 1);
    if (close == std::string::npos) return false;
    *start = v + 1;
    *end = close;
  } else {
    size_t close = line.find(' ', v);
    if (close == std::string::npos) close = line.size();
    *start = v;
    *end = close;
  }
  return true;
}

XyzResult* parse_extxyz(const char* filename) {
  FILE* f = fopen(filename, "rb");
  if (!f) return nullptr;
  std::vector<int64_t> frame_sizes;
  std::vector<double> positions, forces, energies, cells;
  std::vector<int64_t> numbers;
  bool any_forces = false;
  char* line = nullptr;
  size_t cap = 0;
  while (true) {
    ssize_t got = getline(&line, &cap, f);
    if (got < 0) break;
    // skip blank lines between frames
    char* p = line;
    while (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r') ++p;
    if (*p == '\0') continue;
    long n_atoms = strtol(p, nullptr, 10);
    if (n_atoms <= 0) break;
    frame_sizes.push_back(n_atoms);
    // comment line
    got = getline(&line, &cap, f);
    if (got < 0) break;
    std::string comment(line, got);
    size_t s, e;
    double energy = NAN;
    if (find_key(comment, "energy", &s, &e) ||
        find_key(comment, "Energy", &s, &e)) {
      energy = strtod(comment.c_str() + s, nullptr);
    }
    energies.push_back(energy);
    double cell[9] = {0};
    if (find_key(comment, "Lattice", &s, &e)) {
      const char* q = comment.c_str() + s;
      char* next;
      for (int i = 0; i < 9; ++i) {
        cell[i] = strtod(q, &next);
        q = next;
      }
    }
    for (int i = 0; i < 9; ++i) cells.push_back(cell[i]);
    // column layout from Properties: find force columns
    int force_col = -1;  // column index (token offset) of force block
    int n_cols = 0;
    if (find_key(comment, "Properties", &s, &e)) {
      std::string props = comment.substr(s, e - s);
      int col = 0;
      size_t pos = 0;
      while (pos < props.size()) {
        size_t c1 = props.find(':', pos);
        if (c1 == std::string::npos) break;
        std::string name = props.substr(pos, c1 - pos);
        size_t c2 = props.find(':', c1 + 1);
        size_t c3 = props.find(':', c2 + 1);
        if (c3 == std::string::npos) c3 = props.size();
        int width = atoi(props.c_str() + c2 + 1);
        if (name == "force" || name == "forces") force_col = col;
        col += width;
        pos = (c3 == props.size()) ? c3 : c3 + 1;
        // advance past the width field to the next property name
        size_t next_prop = props.find(':', c2 + 1);
        pos = (next_prop == std::string::npos) ? props.size()
                                               : next_prop + 1;
      }
      n_cols = col;
    }
    if (force_col >= 0) any_forces = true;
    // atom lines
    for (long i = 0; i < n_atoms; ++i) {
      got = getline(&line, &cap, f);
      if (got < 0) break;
      char* q = line;
      // species token
      while (*q == ' ' || *q == '\t') ++q;
      char* tok = q;
      while (*q && *q != ' ' && *q != '\t') ++q;
      numbers.push_back(symbol_to_z(tok, q - tok));
      int col = 1;
      double px = 0, py = 0, pz = 0, fx = 0, fy = 0, fz = 0;
      while (*q) {
        char* next;
        double value = strtod(q, &next);
        if (next == q) break;
        if (col == 1) px = value;
        else if (col == 2) py = value;
        else if (col == 3) pz = value;
        else if (force_col >= 0 && col == force_col) fx = value;
        else if (force_col >= 0 && col == force_col + 1) fy = value;
        else if (force_col >= 0 && col == force_col + 2) fz = value;
        q = next;
        ++col;
      }
      positions.push_back(px);
      positions.push_back(py);
      positions.push_back(pz);
      forces.push_back(fx);
      forces.push_back(fy);
      forces.push_back(fz);
    }
  }
  free(line);
  fclose(f);
  XyzResult* result = new XyzResult();
  result->n_frames = frame_sizes.size();
  result->n_atoms_total = numbers.size();
  result->has_forces = any_forces ? 1 : 0;
  result->frame_sizes = new int64_t[frame_sizes.size()];
  memcpy(result->frame_sizes, frame_sizes.data(),
         frame_sizes.size() * sizeof(int64_t));
  result->positions = new double[positions.size()];
  memcpy(result->positions, positions.data(),
         positions.size() * sizeof(double));
  result->forces = new double[forces.size()];
  memcpy(result->forces, forces.data(), forces.size() * sizeof(double));
  result->numbers = new int64_t[numbers.size()];
  memcpy(result->numbers, numbers.data(),
         numbers.size() * sizeof(int64_t));
  result->energies = new double[energies.size()];
  memcpy(result->energies, energies.data(),
         energies.size() * sizeof(double));
  result->cells = new double[cells.size()];
  memcpy(result->cells, cells.data(), cells.size() * sizeof(double));
  return result;
}

void free_xyz_result(XyzResult* result) {
  if (!result) return;
  delete[] result->frame_sizes;
  delete[] result->positions;
  delete[] result->forces;
  delete[] result->numbers;
  delete[] result->energies;
  delete[] result->cells;
  delete result;
}

// ---------------------------------------------------------------------
// cell-list neighbor construction (orthorhombic-projected binning;
// general cells via fractional-coordinate bins)
// ---------------------------------------------------------------------
// Fills idx (n, capacity), shift (n, capacity, 3), mask (n, capacity);
// returns the maximum neighbor count seen (may exceed capacity).
int64_t cell_list_neighbors(const double* positions, int64_t n_atoms,
                            const double* cell, const uint8_t* pbc,
                            double r_cut, int64_t capacity,
                            int32_t* idx, double* shift, uint8_t* mask) {
  // fractional coordinates: solve cell^T f = r (row-vector convention
  // cartesian = frac @ cell)
  double a[3][3];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) a[i][j] = cell[3 * i + j];
  // invert 3x3
  double det = a[0][0] * (a[1][1] * a[2][2] - a[1][2] * a[2][1]) -
               a[0][1] * (a[1][0] * a[2][2] - a[1][2] * a[2][0]) +
               a[0][2] * (a[1][0] * a[2][1] - a[1][1] * a[2][0]);
  double inv[3][3];
  inv[0][0] = (a[1][1] * a[2][2] - a[1][2] * a[2][1]) / det;
  inv[0][1] = (a[0][2] * a[2][1] - a[0][1] * a[2][2]) / det;
  inv[0][2] = (a[0][1] * a[1][2] - a[0][2] * a[1][1]) / det;
  inv[1][0] = (a[1][2] * a[2][0] - a[1][0] * a[2][2]) / det;
  inv[1][1] = (a[0][0] * a[2][2] - a[0][2] * a[2][0]) / det;
  inv[1][2] = (a[0][2] * a[1][0] - a[0][0] * a[1][2]) / det;
  inv[2][0] = (a[1][0] * a[2][1] - a[1][1] * a[2][0]) / det;
  inv[2][1] = (a[0][1] * a[2][0] - a[0][0] * a[2][1]) / det;
  inv[2][2] = (a[0][0] * a[1][1] - a[0][1] * a[1][0]) / det;
  std::vector<double> frac(3 * n_atoms);
  for (int64_t i = 0; i < n_atoms; ++i) {
    for (int d = 0; d < 3; ++d) {
      double v = 0;
      for (int k = 0; k < 3; ++k) v += positions[3 * i + k] * inv[k][d];
      if (pbc[d]) v -= floor(v);  // wrap into [0, 1)
      frac[3 * i + d] = v;
    }
  }
  // bin counts per direction (>= 1); bin size >= r_cut in plane
  // distance along each cell direction
  int nb[3];
  for (int d = 0; d < 3; ++d) {
    // perpendicular width of the cell along direction d
    int e1 = (d + 1) % 3, e2 = (d + 2) % 3;
    double n_vec[3] = {
        a[e1][1] * a[e2][2] - a[e1][2] * a[e2][1],
        a[e1][2] * a[e2][0] - a[e1][0] * a[e2][2],
        a[e1][0] * a[e2][1] - a[e1][1] * a[e2][0]};
    double norm = sqrt(n_vec[0] * n_vec[0] + n_vec[1] * n_vec[1] +
                       n_vec[2] * n_vec[2]);
    double width = fabs(a[d][0] * n_vec[0] + a[d][1] * n_vec[1] +
                        a[d][2] * n_vec[2]) / (norm > 0 ? norm : 1.0);
    nb[d] = (int)floor(width / r_cut);
    if (nb[d] < 1) nb[d] = 1;
  }
  int64_t n_bins = (int64_t)nb[0] * nb[1] * nb[2];
  std::vector<std::vector<int32_t>> bins(n_bins);
  auto bin_of = [&](int bx, int by, int bz) {
    return ((int64_t)bx * nb[1] + by) * nb[2] + bz;
  };
  for (int64_t i = 0; i < n_atoms; ++i) {
    int bx = (int)(frac[3 * i] * nb[0]);
    int by = (int)(frac[3 * i + 1] * nb[1]);
    int bz = (int)(frac[3 * i + 2] * nb[2]);
    if (bx >= nb[0]) bx = nb[0] - 1;
    if (by >= nb[1]) by = nb[1] - 1;
    if (bz >= nb[2]) bz = nb[2] - 1;
    bins[bin_of(bx, by, bz)].push_back((int32_t)i);
  }
  double r_cut2 = r_cut * r_cut;
  int64_t max_count = 0;
  for (int64_t i = 0; i < n_atoms; ++i) {
    int bx = (int)(frac[3 * i] * nb[0]);
    int by = (int)(frac[3 * i + 1] * nb[1]);
    int bz = (int)(frac[3 * i + 2] * nb[2]);
    if (bx >= nb[0]) bx = nb[0] - 1;
    if (by >= nb[1]) by = nb[1] - 1;
    if (bz >= nb[2]) bz = nb[2] - 1;
    int64_t count = 0;
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          int cx = bx + dx, cy = by + dy, cz = bz + dz;
          int sx = 0, sy = 0, sz = 0;
          if (pbc[0]) {
            if (cx < 0) { cx += nb[0]; sx = -1; }
            if (cx >= nb[0]) { cx -= nb[0]; sx = 1; }
          }
          if (pbc[1]) {
            if (cy < 0) { cy += nb[1]; sy = -1; }
            if (cy >= nb[1]) { cy -= nb[1]; sy = 1; }
          }
          if (pbc[2]) {
            if (cz < 0) { cz += nb[2]; sz = -1; }
            if (cz >= nb[2]) { cz -= nb[2]; sz = 1; }
          }
          if (cx < 0 || cx >= nb[0] || cy < 0 || cy >= nb[1] ||
              cz < 0 || cz >= nb[2])
            continue;
          // when a direction has < 3 bins, neighbor cells repeat;
          // skip duplicates by requiring |d| == 1 only once
          if ((nb[0] < 3 && dx == 1 && nb[0] == 1) ||
              (nb[1] < 3 && dy == 1 && nb[1] == 1) ||
              (nb[2] < 3 && dz == 1 && nb[2] == 1))
            continue;
          for (int32_t j : bins[bin_of(cx, cy, cz)]) {
            double dvec[3];
            for (int d = 0; d < 3; ++d) {
              double df = frac[3 * j + d] - frac[3 * i + d];
              // apply the bin-level image shift
              double shift_d = (d == 0 ? sx : (d == 1 ? sy : sz));
              df += shift_d;
              dvec[d] = df;
            }
            double cart[3] = {0, 0, 0};
            for (int d = 0; d < 3; ++d)
              for (int k = 0; k < 3; ++k)
                cart[k] += dvec[d] * a[d][k];
            double d2 = cart[0] * cart[0] + cart[1] * cart[1] +
                        cart[2] * cart[2];
            if (d2 < r_cut2 && d2 > 1e-12) {
              if (count < capacity) {
                idx[i * capacity + count] = j;
                double sh[3] = {
                    (double)(bx + dx < 0 ? -1 :
                             (bx + dx >= nb[0] ? 1 : 0)),
                    (double)(by + dy < 0 ? -1 :
                             (by + dy >= nb[1] ? 1 : 0)),
                    (double)(bz + dz < 0 ? -1 :
                             (bz + dz >= nb[2] ? 1 : 0))};
                // shift must also account for the in-bin wrap of
                // fractional coordinates (atoms were wrapped, so the
                // stored shift is the bin-level image only)
                for (int d = 0; d < 3; ++d)
                  shift[(i * capacity + count) * 3 + d] = sh[d];
                mask[i * capacity + count] = 1;
              }
              ++count;
            }
          }
        }
    if (count > max_count) max_count = count;
  }
  return max_count;
}
}  // extern "C"
