// Native runtime for rmi_tpu artifacts.
//
// Plays the role of the reference's generated C++ (codegen.rs:612-718)
// plus its Rust host passes, as a data-driven interpreter over the
// serialized artifact instead of generated source:
//   * rmi_cache_fix      — the greedy error-bounded spline
//                          (cache_fix.rs:45-150), the one sequential
//                          algorithm in the build, streamed in C++;
//   * rmi_load/rmi_free  — artifact loading from the metadata JSON +
//                          binary parameter blobs written by
//                          rmi_tpu.serialize;
//   * rmi_lookup_batch   — top eval -> leaf eval -> clamp -> error;
//   * rmi_search_batch   — bounded last-mile lower_bound.
//
// Exposed with a C ABI for ctypes (rmi_tpu/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// cache_fix greedy spline
// ---------------------------------------------------------------------------

namespace {

struct SplineState {
  uint64_t fx, fy, tx, ty;
  bool have = false;
  std::vector<std::pair<uint64_t, uint64_t>> curr;
};

inline uint64_t lerp_predict(uint64_t fx, uint64_t fy, uint64_t tx,
                             uint64_t ty, uint64_t x) {
  double t = double(x - fx) / double(tx - fx);
  // Explicit fma: the reference's Spline::predict uses f64::mul_add
  // (cache_fix.rs:41).  Relying on compiler contraction (-ffp-contract)
  // would make the knot stream depend on build flags.
  return (uint64_t)std::fma(1.0 - t, double(fy), t * double(ty));
}

}  // namespace

// Returns the number of knots written, or -1 on error.  out_k/out_v
// must have room for 2*n + 2 entries.
int64_t rmi_cache_fix(const uint64_t* keys, const uint64_t* offsets,
                      uint64_t n, uint64_t line_size, uint64_t* out_k,
                      uint64_t* out_v) {
  SplineState st;
  int64_t m = 0;

  auto emit = [&](uint64_t k, uint64_t v) {
    out_k[m] = k;
    out_v[m] = v;
    ++m;
  };

  auto add_point = [&](uint64_t px, uint64_t py) {
    if (!st.have) {
      st.have = true;
      st.fx = st.tx = px;
      st.fy = st.ty = py;
      emit(px, py);
      return;
    }
    st.curr.emplace_back(st.tx, st.ty);
    bool ok = px != st.fx;
    if (ok) {
      for (const auto& pt : st.curr) {
        if (lerp_predict(st.fx, st.fy, px, py, pt.first) / line_size !=
            pt.second / line_size) {
          ok = false;
          break;
        }
      }
    }
    if (ok) {
      st.tx = px;
      st.ty = py;
    } else {
      emit(st.tx, st.ty);
      st.fx = st.tx;
      st.fy = st.ty;
      st.tx = px;
      st.ty = py;
      st.curr.clear();
      st.curr.emplace_back(px, py);
    }
  };

  uint64_t last_key = 0;
  for (uint64_t i = 0; i < n; ++i) {
    uint64_t k = keys[i], off = offsets[i];
    if (k - 1 != last_key) add_point(k - 1, off);
    add_point(k, off);
    last_key = k;
  }
  if (st.have) emit(st.tx, st.ty);
  return m;
}

// ---------------------------------------------------------------------------
// artifact server
// ---------------------------------------------------------------------------

namespace {

enum class TopKind {
  kLinear,       // alpha+beta*x
  kLogLinear,
  kCubic,
  kNormal,
  kLogNormal,
  kRadix,
  kBradixHigh,
  kBradixLow,
  kRadixTable,
  kHistogram,
};

enum class LeafKind { kLinear, kLogLinear, kCubic, kNormal, kLogNormal,
                      kRadixTable };

struct Artifact {
  TopKind top;
  LeafKind leaf;
  uint64_t B = 0;
  uint64_t n = 0;            // num_rmi_rows
  uint64_t n_data = 0;       // num_data_rows
  int ppm = 2;               // leaf doubles per model
  bool has_err = false;
  bool key_is_float = false;

  std::vector<double> top_f;      // scalar float params
  std::vector<uint64_t> top_i;    // scalar int params (radix/bradix)
  std::vector<uint32_t> table;    // radix hint table
  uint64_t table_prefix = 0, table_bits = 0;
  std::vector<uint64_t> hist_radix, hist_pivots;

  std::vector<uint64_t> leaf_raw;  // stride = ppm (+1 if has_err)
  uint64_t leaf_table_bits = 0;    // radix-table leaves: per-leaf
                                   // [u64 prefix | u32 table | (err)]

  bool has_cf = false;
  uint64_t line_size = 0;
  std::vector<uint64_t> cf_keys, cf_vals;
};

inline double exp1(double v) {
  double x = 1.0 + v / 64.0;
  x *= x; x *= x; x *= x; x *= x; x *= x; x *= x;
  return x;
}

inline double phi(double v) { return 1.0 / (1.0 + exp1(-1.65451 * v)); }

inline uint64_t predict_to_int(double f) {
  if (std::isnan(f)) return 0;
  double fl = std::floor(f);
  if (fl <= 0.0) return 0;
  if (fl >= 1.8446744073709552e19) return UINT64_MAX;
  return (uint64_t)fl;
}

// Tiny JSON field scanners — the metadata is machine-written flat JSON,
// so targeted key lookups are sufficient (no general parser needed).
bool json_u64(const std::string& s, const std::string& key, uint64_t* out) {
  auto pos = s.find("\"" + key + "\"");
  if (pos == std::string::npos) return false;
  pos = s.find(':', pos);
  if (pos == std::string::npos) return false;
  *out = strtoull(s.c_str() + pos + 1, nullptr, 10);
  return true;
}

bool json_str(const std::string& s, const std::string& key,
              std::string* out) {
  auto pos = s.find("\"" + key + "\"");
  if (pos == std::string::npos) return false;
  pos = s.find(':', pos);
  auto q1 = s.find('"', pos);
  auto q2 = s.find('"', q1 + 1);
  if (q1 == std::string::npos || q2 == std::string::npos) return false;
  *out = s.substr(q1 + 1, q2 - q1 - 1);
  return true;
}

bool json_bool(const std::string& s, const std::string& key, bool* out) {
  auto pos = s.find("\"" + key + "\"");
  if (pos == std::string::npos) return false;
  pos = s.find(':', pos);
  auto t = s.find("true", pos);
  auto f = s.find("false", pos);
  *out = (t != std::string::npos && (f == std::string::npos || t < f));
  return true;
}

// "values": [a, b, ...] — scalar top-layer constants
bool json_values(const std::string& s, std::vector<double>* out) {
  auto pos = s.find("\"values\"");
  if (pos == std::string::npos) return false;
  auto lb = s.find('[', pos);
  auto rb = s.find(']', lb);
  if (lb == std::string::npos || rb == std::string::npos) return false;
  std::stringstream ss(s.substr(lb + 1, rb - lb - 1));
  std::string tok;
  while (std::getline(ss, tok, ',')) out->push_back(atof(tok.c_str()));
  return true;
}

bool read_file(const std::string& path, std::vector<char>* out) {
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f.good()) return false;
  auto sz = f.tellg();
  f.seekg(0);
  out->resize((size_t)sz);
  f.read(out->data(), sz);
  return f.good();
}

uint64_t top_predict(const Artifact& a, uint64_t key) {
  double x;
  if (a.key_is_float) memcpy(&x, &key, 8); else x = (double)key;
  switch (a.top) {
    case TopKind::kLinear:
      return predict_to_int(std::fma(a.top_f[1], x, a.top_f[0]));
    case TopKind::kLogLinear:
      return predict_to_int(exp1(std::fma(a.top_f[1], x, a.top_f[0])));
    case TopKind::kCubic: {
      double v = std::fma(a.top_f[0], x, a.top_f[1]);
      v = std::fma(v, x, a.top_f[2]);
      v = std::fma(v, x, a.top_f[3]);
      return predict_to_int(v);
    }
    case TopKind::kNormal:
      return predict_to_int(
          phi((x - a.top_f[0]) / a.top_f[1]) * a.top_f[2]);
    case TopKind::kLogNormal:
      return predict_to_int(
          phi((std::fmax(0.0, std::log(x)) - a.top_f[0]) / a.top_f[1]) *
          a.top_f[2]);
    case TopKind::kRadix:
      return (key << a.top_i[0]) >> (64 - a.top_i[1]);
    case TopKind::kBradixHigh: {
      uint64_t v = (key << a.top_i[0]) >> (64 - a.top_i[1]);
      return v > a.top_i[2] ? a.top_i[2] : v;
    }
    case TopKind::kBradixLow: {
      uint64_t v = (key << a.top_i[0]) >> (64 - a.top_i[1]);
      return v < a.top_i[2] ? 0 : v - a.top_i[2];
    }
    case TopKind::kRadixTable: {
      uint64_t p = a.table_prefix, b = a.table_bits;
      uint64_t shift = (p + b > 64) ? 0 : 64 - (p + b);
      uint64_t masked = p >= 64 ? 0 : ((key << p) >> p);
      return a.table[masked >> shift];
    }
    case TopKind::kHistogram: {
      uint64_t r = key >> (64 - 20);
      uint64_t lb = a.hist_radix[r], ub = a.hist_radix[r + 1];
      const uint64_t* base = a.hist_pivots.data();
      const uint64_t* it =
          std::upper_bound(base + lb, base + ub, key);
      return (uint64_t)(it - base) - 1;  // wraps below first pivot
    }
  }
  return 0;
}

inline const double* leaf_ptr(const Artifact& a, uint64_t idx) {
  size_t stride = a.ppm + (a.has_err ? 1 : 0);
  return reinterpret_cast<const double*>(a.leaf_raw.data() + idx * stride);
}

double leaf_predict_f(const Artifact& a, uint64_t idx, uint64_t key) {
  const double* p = leaf_ptr(a, idx);
  double x;
  if (a.key_is_float) memcpy(&x, &key, 8); else x = (double)key;
  switch (a.leaf) {
    case LeafKind::kLinear:
      return std::fma(p[1], x, p[0]);
    case LeafKind::kLogLinear:
      return exp1(std::fma(p[1], x, p[0]));
    case LeafKind::kCubic: {
      double v = std::fma(p[0], x, p[1]);
      v = std::fma(v, x, p[2]);
      return std::fma(v, x, p[3]);
    }
    case LeafKind::kNormal:
      return phi((x - p[0]) / p[1]) * p[2];
    case LeafKind::kLogNormal:
      return phi((std::fmax(0.0, std::log(x)) - p[0]) / p[1]) * p[2];
  }
  return 0.0;
}

void rmi_lookup_one(const Artifact& a, uint64_t key, uint64_t* guess,
                    uint64_t* err) {
  uint64_t t = top_predict(a, key);
  if (t > a.B - 1) t = a.B - 1;
  uint64_t g;
  uint64_t e = 0;
  if (a.leaf == LeafKind::kRadixTable) {
    // per-leaf record: u64 prefix, 2^bits u32 table, (u64 max_err)
    uint64_t size = 1ull << a.leaf_table_bits;
    size_t rec_bytes = 8 + 4 * size + (a.has_err ? 8 : 0);
    const char* rec =
        reinterpret_cast<const char*>(a.leaf_raw.data()) + t * rec_bytes;
    uint64_t prefix;
    memcpy(&prefix, rec, 8);
    const uint32_t* table = reinterpret_cast<const uint32_t*>(rec + 8);
    uint64_t low = prefix >= 64 ? 0 : ((key << prefix) >> prefix);
    uint64_t sh = (prefix + a.leaf_table_bits > 64)
                      ? 0
                      : 64 - prefix - a.leaf_table_bits;
    g = table[low >> sh];
    if (g > a.n - 1) g = a.n - 1;
    if (a.has_err) memcpy(&e, rec + 8 + 4 * size, 8);
  } else {
    double f = leaf_predict_f(a, t, key);
    g = predict_to_int(f);
    if (g > a.n - 1) g = a.n - 1;
    if (a.has_err) {
      const uint64_t* row =
          a.leaf_raw.data() + t * (a.ppm + 1);
      e = row[a.ppm];
    }
  }

  if (a.has_cf) {
    // spline lookup (codegen.rs:412-444)
    uint64_t npts = a.cf_keys.size();
    uint64_t upper = std::min(g + e + 1, npts);
    uint64_t lower = e > g ? 0 : g - e;
    const uint64_t* base = a.cf_keys.data();
    const uint64_t* res =
        std::lower_bound(base + lower, base + upper, key);
    uint64_t idx = (uint64_t)(res - base);
    if (idx >= npts) {
      *guess = a.n_data - 1;
      *err = a.line_size;
      return;
    }
    if (idx == 0) idx = 1;
    double v0 = (double)a.cf_vals[idx - 1];
    double v1 = (double)a.cf_vals[idx];
    double t2 = double(key - a.cf_keys[idx - 1]) /
                double(a.cf_keys[idx] - a.cf_keys[idx - 1]);
    uint64_t pos = (uint64_t)std::fma(1.0 - t2, v0, t2 * v1);
    *guess = (pos / a.line_size) * a.line_size;
    *err = a.line_size;
    return;
  }

  *guess = g;
  *err = e;
}

}  // namespace

void* rmi_load(const char* meta_path) {
  std::vector<char> buf;
  if (!read_file(meta_path, &buf)) return nullptr;
  std::string s(buf.begin(), buf.end());

  auto* a = new Artifact();
  std::string dir(meta_path);
  auto slash = dir.find_last_of('/');
  dir = slash == std::string::npos ? std::string(".") : dir.substr(0, slash);

  std::string models, ns, keytype;
  if (!json_str(s, "models", &models)) goto fail;
  if (!json_str(s, "namespace", &ns)) goto fail;
  json_str(s, "key_type", &keytype);
  a->key_is_float = keytype == "f64";
  if (!json_u64(s, "branching_factor", &a->B)) goto fail;
  if (!json_u64(s, "num_rmi_rows", &a->n)) goto fail;
  json_u64(s, "num_data_rows", &a->n_data);
  json_bool(s, "include_errors", &a->has_err);

  {
    auto comma = models.find(',');
    std::string top = models.substr(0, comma);
    std::string leaf = models.substr(comma + 1);

    if (top == "linear" || top == "robust_linear" || top == "linear_spline")
      a->top = TopKind::kLinear;
    else if (top == "loglinear")
      a->top = TopKind::kLogLinear;
    else if (top == "cubic")
      a->top = TopKind::kCubic;
    else if (top == "normal")
      a->top = TopKind::kNormal;
    else if (top == "lognormal")
      a->top = TopKind::kLogNormal;
    else if (top == "radix")
      a->top = TopKind::kRadix;
    else if (top == "bradix") {
      bool high = true;
      json_bool(s, "bradix_high", &high);
      a->top = high ? TopKind::kBradixHigh : TopKind::kBradixLow;
    } else if (top == "histogram")
      a->top = TopKind::kHistogram;
    else if (top.rfind("radix", 0) == 0)
      a->top = TopKind::kRadixTable;
    else
      goto fail;

    if (leaf == "linear" || leaf == "robust_linear" ||
        leaf == "linear_spline") {
      a->leaf = LeafKind::kLinear;
      a->ppm = 2;
    } else if (leaf == "loglinear") {
      a->leaf = LeafKind::kLogLinear;
      a->ppm = 2;
    } else if (leaf == "cubic") {
      a->leaf = LeafKind::kCubic;
      a->ppm = 4;
    } else if (leaf == "normal") {
      a->leaf = LeafKind::kNormal;
      a->ppm = 3;
    } else if (leaf == "lognormal") {
      a->leaf = LeafKind::kLogNormal;
      a->ppm = 3;
    } else if (leaf.rfind("radix", 0) == 0 && leaf != "radix" &&
               leaf != "bradix") {
      a->leaf = LeafKind::kRadixTable;
      a->leaf_table_bits = std::stoull(leaf.substr(5));
      a->ppm = 0;
    } else
      goto fail;

    // top params
    if (a->top == TopKind::kRadix || a->top == TopKind::kBradixHigh ||
        a->top == TopKind::kBradixLow) {
      std::vector<double> vals;
      if (!json_values(s, &vals)) goto fail;
      for (double v : vals) a->top_i.push_back((uint64_t)v);
    } else if (a->top == TopKind::kRadixTable) {
      uint64_t prefix = 0, bits = 0;
      json_u64(s, "prefix", &prefix);
      json_u64(s, "bits", &bits);
      a->table_prefix = prefix;
      a->table_bits = bits;
      std::vector<char> blob;
      if (!read_file(dir + "/" + ns + "_L0_PARAMETERS", &blob)) goto fail;
      a->table.resize(blob.size() / 4);
      memcpy(a->table.data(), blob.data(), blob.size());
    } else if (a->top == TopKind::kHistogram) {
      uint64_t nb = 0;
      json_u64(s, "num_bins", &nb);
      std::vector<char> blob;
      if (!read_file(dir + "/" + ns + "_L0_PARAMETERS", &blob)) goto fail;
      const uint64_t* u = reinterpret_cast<const uint64_t*>(blob.data());
      uint64_t radix_len = (1ull << 20) + 1;
      a->hist_radix.assign(u + 1, u + 1 + radix_len);
      a->hist_pivots.assign(u + 1 + radix_len, u + 1 + radix_len + nb);
    } else {
      std::vector<double> vals;
      if (!json_values(s, &vals)) goto fail;
      a->top_f = vals;
    }

    // leaf params
    {
      std::vector<char> blob;
      if (!read_file(dir + "/" + ns + "_L1_PARAMETERS", &blob)) goto fail;
      a->leaf_raw.resize(blob.size() / 8);
      memcpy(a->leaf_raw.data(), blob.data(), blob.size());
    }

    // cachefix spline
    uint64_t line_size = 0;
    if (json_u64(s, "line_size", &line_size) && line_size > 0) {
      a->has_cf = true;
      a->line_size = line_size;
      std::vector<char> blob;
      if (!read_file(dir + "/" + ns + "_L2_PARAMETERS", &blob)) goto fail;
      size_t npts = blob.size() / 16;
      const uint64_t* u = reinterpret_cast<const uint64_t*>(blob.data());
      a->cf_keys.resize(npts);
      a->cf_vals.resize(npts);
      for (size_t i = 0; i < npts; ++i) {
        a->cf_keys[i] = u[2 * i];
        a->cf_vals[i] = u[2 * i + 1];
      }
    }
  }
  return a;

fail:
  delete a;
  return nullptr;
}

void rmi_free(void* handle) { delete static_cast<Artifact*>(handle); }

void rmi_lookup_batch(void* handle, const uint64_t* queries, uint64_t nq,
                      uint64_t* out_guess, uint64_t* out_err) {
  const Artifact& a = *static_cast<Artifact*>(handle);
  for (uint64_t i = 0; i < nq; ++i)
    rmi_lookup_one(a, queries[i], &out_guess[i], &out_err[i]);
}

void rmi_search_batch(void* handle, const uint64_t* queries, uint64_t nq,
                      const uint64_t* keys, uint64_t nk, uint64_t* out) {
  const Artifact& a = *static_cast<Artifact*>(handle);
  for (uint64_t i = 0; i < nq; ++i) {
    uint64_t g, e;
    rmi_lookup_one(a, queries[i], &g, &e);
    if (a.has_cf) e += 1;
    uint64_t lo = e > g ? 0 : g - e;
    uint64_t hi = std::min(g + e + 1, nk);
    if (lo > nk) lo = nk;
    const uint64_t* it =
        std::lower_bound(keys + lo, keys + hi, queries[i]);
    out[i] = (uint64_t)(it - keys);
  }
}

}  // extern "C"
