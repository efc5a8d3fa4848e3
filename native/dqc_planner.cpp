/* Native tape compiler: gate fusion + distributed layout planning.
 * See dqc_planner.h for the encoding; semantics mirror the Python
 * reference implementations in dqc_tpu/circuit/fusion.py and
 * dqc_tpu/parallel/layout.py (parity enforced by tests/test_native.py).
 */

#include "dqc_planner.h"

#include <algorithm>
#include <map>
#include <vector>

namespace {

constexpr int32_t KIND_GATE = 0;
constexpr int32_t KIND_DIAG = 1;
constexpr int32_t KIND_DENSITY = 2;

struct Instr {
  int32_t kind, var, unitary, diff, k;
  int32_t pos[4];
};

std::vector<Instr> decode(const int32_t* tape, int32_t num_instr) {
  std::vector<Instr> out;
  out.reserve(num_instr);
  for (int32_t i = 0; i < num_instr; ++i) {
    const int32_t* r = tape + i * DQC_TAPE_W;
    Instr in{r[0], r[1], r[2], r[3], r[4], {r[5], r[6], r[7], r[8]}};
    out.push_back(in);
  }
  return out;
}

class Writer {
 public:
  Writer(int32_t* buf, int32_t cap) : buf_(buf), cap_(cap), len_(0), ok_(true) {}
  void put(int32_t v) {
    if (len_ >= cap_) { ok_ = false; return; }
    buf_[len_++] = v;
  }
  int32_t finish() const { return ok_ ? len_ : -1; }

 private:
  int32_t* buf_;
  int32_t cap_, len_;
  bool ok_;
};

struct GateRef {
  int32_t var, queue_idx, diag, unitary, k;
  int32_t rel[4];
};

}  // namespace

// Error codes: -1 = planner failure (capacity overflow / internal bug,
// callers warn); -2 = invalid INPUT (callers fall back silently so the
// Python reference implementation raises its actionable error).
extern "C" int32_t dqc_planner_version(void) { return 3; }

extern "C" int32_t dqc_fuse_tape(const int32_t* tape, int32_t num_instr,
                                 int32_t n_qubits, int32_t group_bits,
                                 int32_t* out, int32_t out_cap) {
  if (group_bits <= 0 || n_qubits <= 0) return -2;
  auto instrs = decode(tape, num_instr);
  Writer w(out, out_cap);

  std::map<int32_t, std::vector<GateRef>> pending;  // group -> refs (ordered)

  auto flush_group = [&](int32_t j) {
    auto it = pending.find(j);
    if (it == pending.end() || it->second.empty()) return;
    w.put(1);
    w.put(j);
    w.put(static_cast<int32_t>(it->second.size()));
    for (const auto& g : it->second) {
      w.put(g.var); w.put(g.queue_idx); w.put(g.diag); w.put(g.unitary);
      w.put(g.k);
      for (int32_t b = 0; b < 4; ++b) w.put(b < g.k ? g.rel[b] : -1);
    }
    pending.erase(it);
  };
  auto flush_all = [&]() {
    // std::map iterates keys sorted ascending, matching Python's sorted()
    std::vector<int32_t> keys;
    for (auto& kv : pending) keys.push_back(kv.first);
    for (int32_t j : keys) flush_group(j);
  };

  int32_t var_idx = 0, const_idx = 0;
  for (const auto& in : instrs) {
    if (in.kind == KIND_DENSITY) {
      flush_all();
      w.put(3);
      w.put(in.diff);
      w.put(in.k);
      for (int32_t b = 0; b < 4; ++b) w.put(b < in.k ? in.pos[b] : -1);
      continue;
    }
    int32_t qidx = in.var ? var_idx++ : const_idx++;
    // group membership
    int32_t g0 = in.pos[0] / group_bits;
    bool same_group = true;
    for (int32_t b = 1; b < in.k; ++b) {
      if (in.pos[b] / group_bits != g0) same_group = false;
    }
    if (same_group) {
      GateRef ref;
      ref.var = in.var;
      ref.queue_idx = qidx;
      ref.diag = (in.kind == KIND_DIAG) ? 1 : 0;
      ref.unitary = in.unitary;
      ref.k = in.k;
      for (int32_t b = 0; b < in.k; ++b) ref.rel[b] = in.pos[b] % group_bits;
      pending[g0].push_back(ref);
    } else {
      // cross-group gate (any k): flush involved groups ascending, emit an
      // extended cross record [2, k, p0..p3, var, unitary, qidx, diag].
      // Commutation-aware deferral: a cross-group DIAGONAL commutes with
      // pending blocks that hold only diagonals — skip the flush so diag
      // ladders keep extending one block per group (mirrors fusion.py).
      std::vector<int32_t> gs;
      for (int32_t b = 0; b < in.k; ++b) gs.push_back(in.pos[b] / group_bits);
      std::sort(gs.begin(), gs.end());
      gs.erase(std::unique(gs.begin(), gs.end()), gs.end());
      bool defer = (in.kind == KIND_DIAG);
      if (defer) {
        for (int32_t j : gs) {
          auto it = pending.find(j);
          if (it == pending.end()) continue;
          for (const auto& g : it->second) {
            if (!g.diag) { defer = false; break; }
          }
          if (!defer) break;
        }
      }
      if (!defer) {
        for (int32_t j : gs) flush_group(j);
      }
      w.put(2);
      w.put(in.k);
      for (int32_t b = 0; b < 4; ++b) w.put(b < in.k ? in.pos[b] : -1);
      w.put(in.var); w.put(in.unitary); w.put(qidx);
      w.put((in.kind == KIND_DIAG) ? 1 : 0);
    }
  }
  flush_all();
  return w.finish();
}

extern "C" int32_t dqc_plan_distribution(const int32_t* tape, int32_t num_instr,
                                         int32_t n_qubits, int32_t k,
                                         int32_t* out, int32_t out_cap,
                                         int32_t* final_phys) {
  auto instrs = decode(tape, num_instr);
  const int32_t m = n_qubits - k;
  if (m < k) return -2;
  // validate every position BEFORE the next-use table writes index by it:
  // this is an extern-C ABI entry, and an out-of-range position from encoder
  // drift would otherwise be an out-of-bounds heap write, not a wrong plan
  for (const auto& in : instrs) {
    for (int32_t b = 0; b < in.k; ++b) {
      if (in.pos[b] < 0 || in.pos[b] >= n_qubits) return -2;
    }
  }
  Writer w(out, out_cap);

  std::vector<int32_t> phys(n_qubits);
  for (int32_t q = 0; q < n_qubits; ++q) phys[q] = q;

  // next_use table in ONE reverse sweep: nxt[i * n + q] = first instruction
  // at-or-after i touching logical qubit q (O(T*n), mirrors layout.py's
  // _next_use_table; the old per-query tail scan was O(T^2) on deep tapes)
  constexpr int64_t kNoUse = int64_t{1} << 40;
  std::vector<int64_t> nxt(static_cast<size_t>(num_instr + 1) * n_qubits,
                           kNoUse);
  for (int32_t i = num_instr - 1; i >= 0; --i) {
    int64_t* row = nxt.data() + static_cast<size_t>(i) * n_qubits;
    const int64_t* next_row = row + n_qubits;
    std::copy(next_row, next_row + n_qubits, row);
    for (int32_t b = 0; b < instrs[i].k; ++b) row[instrs[i].pos[b]] = i;
  }
  auto next_use = [&](int32_t start, int32_t logical) -> int64_t {
    return nxt[static_cast<size_t>(start) * n_qubits + logical];
  };

  int32_t var_idx = 0, const_idx = 0, dens_idx = 0;
  for (int32_t idx = 0; idx < num_instr; ++idx) {
    const auto& in = instrs[idx];
    bool needs_swap = false;
    for (int32_t b = 0; b < in.k; ++b) {
      if (phys[in.pos[b]] >= m) needs_swap = true;
    }
    if (needs_swap && k > 0) {
      std::vector<bool> protectd(m, false);
      int32_t nprot = 0;
      for (int32_t b = 0; b < in.k; ++b) {
        int32_t p = phys[in.pos[b]];
        if (p < m && !protectd[p]) { protectd[p] = true; ++nprot; }
      }
      if (m - nprot < k) return -2;
      std::vector<int32_t> logical_at(m, -1);
      for (int32_t q = 0; q < n_qubits; ++q) {
        if (phys[q] < m) logical_at[phys[q]] = q;
      }
      // candidates sorted by next-use descending (Belady); stable ties as in
      // Python's sort (stable, original order = ascending slot)
      std::vector<int32_t> cand;
      for (int32_t p = 0; p < m; ++p) {
        if (!protectd[p]) cand.push_back(p);
      }
      std::vector<int64_t> nu(m, 0);
      for (int32_t p : cand) nu[p] = next_use(idx, logical_at[p]);
      std::stable_sort(cand.begin(), cand.end(),
                       [&](int32_t a, int32_t b) { return nu[a] > nu[b]; });
      cand.resize(k);
      std::sort(cand.begin(), cand.end(), std::greater<int32_t>());  // msb-first
      w.put(2);
      w.put(k);
      for (int32_t s : cand) w.put(s);
      for (int32_t j = 0; j < k; ++j) {
        int32_t l = cand[k - 1 - j];
        int32_t gslot = m + j;
        int32_t ql = logical_at[l], qg = -1;
        for (int32_t q = 0; q < n_qubits; ++q) {
          if (phys[q] == gslot) { qg = q; break; }
        }
        phys[ql] = gslot;
        phys[qg] = l;
        logical_at[l] = qg;
      }
    }
    int32_t q0 = in.k > 0 ? phys[in.pos[0]] : -1;
    int32_t q1 = in.k > 1 ? phys[in.pos[1]] : -1;
    int32_t q2 = in.k > 2 ? phys[in.pos[2]] : -1;
    int32_t q3 = in.k > 3 ? phys[in.pos[3]] : -1;
    if (in.kind == KIND_DENSITY) {
      w.put(3); w.put(in.diff); w.put(dens_idx++); w.put(in.k);
      w.put(q0); w.put(q1); w.put(q2); w.put(q3);
    } else {
      int32_t qidx = in.var ? var_idx++ : const_idx++;
      w.put(1); w.put(in.kind); w.put(in.var); w.put(in.unitary); w.put(qidx);
      w.put(in.k); w.put(q0); w.put(q1); w.put(q2); w.put(q3);
    }
  }
  for (int32_t q = 0; q < n_qubits; ++q) final_phys[q] = phys[q];
  return w.finish();
}
