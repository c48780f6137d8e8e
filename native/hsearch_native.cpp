// Native host-side kernels for hsearch_tpu.
//
// The reference implements its whole runtime in C++; here the TPU compute
// path is JAX/XLA and the *irregular host-side* components stay native,
// exposed through a plain C ABI consumed via ctypes
// (hsearch_tpu/native_ext.py):
//
//   * FASTA parsing           (smithlab_os.cpp read_fasta_file equivalent)
//   * suffix-array construction (IGC/shuffle_data/IGC/suffix_array.cpp —
//     exact, not 500-char-capped; SA-IS-style doubling)
//   * union-find merging      (pcluster union_find.cpp, implemented for
//     real — the reference's ProteinClustering is an empty stub)
//   * banded gapped alignment with traceback (hash_search.cpp:718-948's
//     AlignGapped — declared but never called in the reference; real here)
//
// Build: `make -C native` -> libhsearch_native.so.  Every entry point has
// a pure-Python fallback; the extension is an accelerator, not a
// dependency.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// FASTA parsing: one pass over the raw bytes; emits AA indices (0..19,
// 20 = unknown) into `seq_out`, per-record start offsets into `starts_out`
// (n_records+1 entries), and name spans into `name_off/name_len`.
// Returns the number of records, or -1 on malformed input.
// Buffers must be caller-allocated: seq_out of len(bytes), starts/name
// arrays of max_records+1.
// ---------------------------------------------------------------------------
int64_t hs_parse_fasta(const char* data, int64_t len, uint8_t* seq_out,
                       int64_t* starts_out, int64_t* name_off,
                       int64_t* name_len, int64_t max_records) {
  static int8_t lut[256];
  static bool init = false;
  if (!init) {
    for (int i = 0; i < 256; ++i) lut[i] = -1;
    const char* aa20 = "ARNDCQEGHILKMFPSTWYV";
    for (int i = 0; i < 20; ++i) {
      lut[(unsigned char)aa20[i]] = (int8_t)i;
      lut[(unsigned char)(aa20[i] + 32)] = (int8_t)i;
    }
    for (int c = 'A'; c <= 'Z'; ++c)
      if (lut[c] < 0) { lut[c] = 20; lut[c + 32] = 20; }
    init = true;
  }
  int64_t n_rec = 0;
  int64_t pos = 0;
  int64_t out = 0;
  starts_out[0] = 0;
  while (pos < len) {
    if (data[pos] == '>') {
      if (n_rec >= max_records) return -1;
      int64_t eol = pos;
      while (eol < len && data[eol] != '\n') ++eol;
      int64_t name_start = pos + 1;
      int64_t name_end = name_start;
      while (name_end < eol && data[name_end] != ' ' &&
             data[name_end] != '\t' && data[name_end] != '\r')
        ++name_end;
      name_off[n_rec] = name_start;
      name_len[n_rec] = name_end - name_start;
      ++n_rec;
      starts_out[n_rec] = out;
      pos = eol + 1;
    } else {
      int64_t eol = pos;
      while (eol < len && data[eol] != '\n') ++eol;
      if (n_rec > 0) {
        for (int64_t i = pos; i < eol; ++i) {
          int8_t v = lut[(unsigned char)data[i]];
          if (v >= 0) seq_out[out++] = (uint8_t)v;
        }
        starts_out[n_rec] = out;
      }
      pos = eol + 1;
    }
  }
  return n_rec;
}

// ---------------------------------------------------------------------------
// Suffix array by prefix doubling with radix-free std::sort on ranks.
// seq: arbitrary int32 symbols; sa_out: caller-allocated length n.
// ---------------------------------------------------------------------------
void hs_suffix_array(const int32_t* seq, int64_t n, int64_t* sa_out) {
  if (n <= 0) return;
  std::vector<int64_t> sa(n), rank(n), tmp(n);
  for (int64_t i = 0; i < n; ++i) { sa[i] = i; rank[i] = seq[i]; }
  for (int64_t k = 1;; k <<= 1) {
    auto cmp = [&](int64_t a, int64_t b) {
      if (rank[a] != rank[b]) return rank[a] < rank[b];
      int64_t ra = a + k < n ? rank[a + k] : -1;
      int64_t rb = b + k < n ? rank[b + k] : -1;
      return ra < rb;
    };
    std::sort(sa.begin(), sa.end(), cmp);
    tmp[sa[0]] = 0;
    for (int64_t i = 1; i < n; ++i)
      tmp[sa[i]] = tmp[sa[i - 1]] + (cmp(sa[i - 1], sa[i]) ? 1 : 0);
    rank = tmp;
    if (rank[sa[n - 1]] == n - 1) break;
  }
  std::memcpy(sa_out, sa.data(), n * sizeof(int64_t));
}

// ---------------------------------------------------------------------------
// Union-find over an edge list; labels_out[i] = smallest reachable root.
// ---------------------------------------------------------------------------
static int64_t uf_find(std::vector<int64_t>& p, int64_t x) {
  while (p[x] != x) { p[x] = p[p[x]]; x = p[x]; }
  return x;
}

void hs_union_find(int64_t n, const int64_t* src, const int64_t* dst,
                   int64_t n_edges, int64_t* labels_out) {
  std::vector<int64_t> p(n);
  std::iota(p.begin(), p.end(), 0);
  for (int64_t e = 0; e < n_edges; ++e) {
    int64_t a = uf_find(p, src[e]);
    int64_t b = uf_find(p, dst[e]);
    if (a == b) continue;
    if (a < b) p[b] = a; else p[a] = b;   // smaller root wins
  }
  for (int64_t i = 0; i < n; ++i) labels_out[i] = uf_find(p, i);
}

// ---------------------------------------------------------------------------
// Banded gapped alignment with traceback (the real implementation of the
// reference's declared-but-dead AlignGapped, hash_search.cpp:718-948).
//
// Global-ish alignment of q[0..m) vs d[0..nn) within a diagonal band of
// half-width `band`, affine gaps (gap_open charged on the first gap
// residue, gap_ext after), substitution from a 21x21 matrix (row-major,
// index 20 = unknown).  Early x-drop abandonment when every cell of a row
// falls below best-so-far - drop.
//
// Returns the alignment length (ops written to ops_out: 0=match/mismatch,
// 1=gap-in-d (deletion from q), 2=gap-in-q (insertion)), or -1 if the
// buffers are too small / inputs invalid.  score_out receives the score of
// the best cell; ext1/ext2 the q/d extents of the best-scoring prefix.
// ---------------------------------------------------------------------------
int64_t hs_align_gapped(const int32_t* q, int64_t m, const int32_t* d,
                        int64_t nn, const int32_t* sub21, int32_t gap_open,
                        int32_t gap_ext, int32_t drop, int64_t band,
                        uint8_t* ops_out, int64_t ops_cap,
                        int32_t* score_out, int64_t* ext1, int64_t* ext2) {
  if (m <= 0 || nn <= 0 || band <= 0) return -1;
  const int32_t NEG = -(1 << 28);
  const int64_t w = 2 * band + 1;
  // H/E/F matrices over the band: column j of row i maps to d-index
  // i - band + jj  (jj in [0, w)).
  std::vector<int32_t> H((m + 1) * w, NEG), E((m + 1) * w, NEG),
      F((m + 1) * w, NEG);
  std::vector<uint8_t> bt((m + 1) * w, 255);
  auto idx = [&](int64_t i, int64_t jj) { return i * w + jj; };
  auto dcol = [&](int64_t i, int64_t jj) { return i - band + jj; };
  // row 0: d-gaps from origin
  int32_t best = 0;
  int64_t bi = 0, bj = 0;
  for (int64_t jj = band; jj < w && dcol(0, jj) <= nn; ++jj) {
    int64_t j = dcol(0, jj);
    if (j < 0) continue;
    H[idx(0, jj)] = j == 0 ? 0 : -(gap_open + (int32_t)(j - 1) * gap_ext);
    bt[idx(0, jj)] = j == 0 ? 3 : 2;
  }
  for (int64_t i = 1; i <= m; ++i) {
    bool alive = false;
    for (int64_t jj = 0; jj < w; ++jj) {
      int64_t j = dcol(i, jj);
      if (j < 0 || j > nn) continue;
      int32_t h = NEG, e = NEG, f = NEG;
      uint8_t op = 255;
      // E: gap in q (move along d): from (i, j-1) = (i, jj-1)
      if (jj > 0 && j > 0) {
        int32_t hh = H[idx(i, jj - 1)];
        int32_t ee = E[idx(i, jj - 1)];
        e = std::max(hh - gap_open, ee - gap_ext);
      }
      // F: gap in d (move along q): from (i-1, j) = (i-1, jj+1)
      if (jj + 1 < w) {
        int32_t hh = H[idx(i - 1, jj + 1)];
        int32_t ff = F[idx(i - 1, jj + 1)];
        f = std::max(hh - gap_open, ff - gap_ext);
      }
      // diagonal from (i-1, j-1) = (i-1, jj)
      if (j > 0) {
        int32_t hh = H[idx(i - 1, jj)];
        if (hh > NEG) {
          int32_t s = sub21[q[i - 1] * 21 + d[j - 1]];
          int32_t diag = hh + s;
          if (diag >= e && diag >= f) { h = diag; op = 0; }
        }
      }
      if (op == 255 || e > h || f > h) {
        if (e >= f) { h = e; op = 2; }
        else { h = f; op = 1; }
      }
      E[idx(i, jj)] = e;
      F[idx(i, jj)] = f;
      if (h <= NEG / 2) continue;
      H[idx(i, jj)] = h;
      bt[idx(i, jj)] = op;
      if (h > best) { best = h; bi = i; bj = jj; }
      if (h >= best - drop) alive = true;
    }
    if (!alive && i > 1) break;   // x-drop: the whole row fell away
  }
  *score_out = best;
  *ext1 = bi;
  *ext2 = dcol(bi, bj);
  // traceback from the best cell
  int64_t i = bi, jj = bj;
  int64_t n_ops = 0;
  std::vector<uint8_t> rev;
  rev.reserve(m + nn);
  while (!(i == 0 && dcol(i, jj) == 0)) {
    uint8_t op = bt[idx(i, jj)];
    if (op == 255 || op == 3) break;
    rev.push_back(op);
    if (op == 0) { i -= 1; /* jj unchanged: same column offset */ }
    else if (op == 1) { i -= 1; jj += 1; }
    else { jj -= 1; }
    if ((int64_t)rev.size() > m + nn) return -1;
  }
  n_ops = (int64_t)rev.size();
  if (n_ops > ops_cap) return -1;
  for (int64_t k = 0; k < n_ops; ++k) ops_out[k] = rev[n_ops - 1 - k];
  return n_ops;
}

// ---------------------------------------------------------------------------
// Reference-style brute-force motif search: for every (center, kmer) pair
// sum the per-position squared metric distances (the exact loop of
// motif_both_points_noLSH.cpp:36-56 / PairwiseDistance_square), emitting
// pairs with distance^2 <= r2.  Single-threaded on purpose: this IS the
// reference's baseline algorithm, used by bench.py as the wall-clock
// baseline the TPU engines are measured against.
// Returns number of hits written (capped at out_cap).
// ---------------------------------------------------------------------------
int64_t hs_brute_search(const int32_t* centers, int64_t c,
                        const int32_t* kmers, int64_t n, int64_t l,
                        const double* dsq /* 20x20 */, double r2,
                        int64_t* out_ci, int64_t* out_ki, double* out_d2,
                        int64_t out_cap) {
  int64_t hits = 0;
  for (int64_t a = 0; a < c; ++a) {
    const int32_t* ca = centers + a * l;
    for (int64_t b = 0; b < n; ++b) {
      const int32_t* kb = kmers + b * l;
      double d2 = 0.0;
      for (int64_t i = 0; i < l; ++i) d2 += dsq[ca[i] * 20 + kb[i]];
      if (d2 <= r2) {
        if (hits < out_cap) {
          out_ci[hits] = a;
          out_ki[hits] = b;
          out_d2[hits] = d2;
        }
        ++hits;
      }
    }
  }
  return hits;
}

}  // extern "C"
