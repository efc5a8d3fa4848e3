/* Standalone unit tests for the native tape compiler.
 *
 * The reference ships a self-test binary for its native layer
 * (reference src/Makefile targets, primitives.cu ghz_test/inv_test under
 * -DCHECK); this is the planner's counterpart: build with
 * `make -C native test` (or via tests/test_native.py, which compiles and
 * runs it from source). Exit code 0 = all checks pass.
 */

#include "dqc_planner.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

static int failures = 0;

#define CHECK(cond)                                                         \
  do {                                                                      \
    if (!(cond)) {                                                          \
      std::fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond);  \
      ++failures;                                                           \
    }                                                                       \
  } while (0)

struct Row {
  int32_t kind, var, unitary, diff, k, p0, p1, p2, p3;
};

static std::vector<int32_t> flatten(const std::vector<Row>& rows) {
  std::vector<int32_t> t;
  for (const Row& r : rows) {
    const int32_t v[DQC_TAPE_W] = {r.kind, r.var, r.unitary, r.diff,
                                   r.k,    r.p0,  r.p1,      r.p2, r.p3};
    t.insert(t.end(), v, v + DQC_TAPE_W);
  }
  return t;
}

static void test_version() { CHECK(dqc_planner_version() == 3); }

/* Two 1q gates in group 0 + one in group 1 fuse into two blocks; a density
 * flushes everything. */
static void test_fuse_basic() {
  std::vector<Row> rows = {
      {0, 1, 1, 0, 1, 0, -1, -1, -1},   // var 1q gate at qubit 0 (group 0)
      {0, 0, 1, 0, 1, 3, -1, -1, -1},   // const 1q gate at qubit 3 (group 0)
      {0, 1, 1, 0, 1, 8, -1, -1, -1},   // var 1q gate at qubit 8 (group 1)
      {2, 0, 0, 1, 1, 0, -1, -1, -1},   // diff 1q density at qubit 0
  };
  auto tape = flatten(rows);
  int32_t out[512];
  int32_t ln = dqc_fuse_tape(tape.data(), (int32_t)rows.size(), 10, 7, out, 512);
  CHECK(ln > 0);
  // stream: block(group 0, 2 gates) + block(group 1, 1 gate) + density
  CHECK(out[0] == 1 && out[1] == 0 && out[2] == 2);
  int32_t i = 3 + 2 * 9;
  CHECK(out[i] == 1 && out[i + 1] == 1 && out[i + 2] == 1);
  i += 3 + 1 * 9;
  CHECK(out[i] == 3 && out[i + 1] == 1 && out[i + 2] == 1 && out[i + 3] == 0);
  CHECK(i + 7 == ln);
}

/* A dense 2q gate spanning groups becomes a cross record and flushes only
 * the groups it touches. */
static void test_fuse_cross() {
  std::vector<Row> rows = {
      {0, 0, 1, 0, 1, 0, -1, -1, -1},   // const 1q at qubit 0 (group 0)
      {0, 0, 1, 0, 1, 8, -1, -1, -1},   // const 1q at qubit 8 (group 1)
      {0, 1, 1, 0, 2, 7, 6, -1, -1},    // var 2q spanning groups 1 and 0
  };
  auto tape = flatten(rows);
  int32_t out[512];
  int32_t ln = dqc_fuse_tape(tape.data(), (int32_t)rows.size(), 10, 7, out, 512);
  CHECK(ln > 0);
  // both pending blocks flush (group order), then the cross record
  CHECK(out[0] == 1 && out[1] == 0 && out[2] == 1);
  int32_t i = 3 + 9;
  CHECK(out[i] == 1 && out[i + 1] == 1 && out[i + 2] == 1);
  i += 3 + 9;
  CHECK(out[i] == 2 && out[i + 1] == 2 /*k*/);
  CHECK(out[i + 2] == 7 && out[i + 3] == 6);
  CHECK(out[i + 6] == 1 /*var*/ && out[i + 9] == 0 /*dense*/);
}

/* A k=3 gate spanning three groups emits one extended cross record. */
static void test_fuse_cross_k3() {
  std::vector<Row> rows = {
      {0, 1, 1, 0, 3, 15, 8, 1, -1},   // var 3q gate over groups 2, 1, 0
  };
  auto tape = flatten(rows);
  int32_t out[512];
  int32_t ln = dqc_fuse_tape(tape.data(), (int32_t)rows.size(), 16, 7, out, 512);
  CHECK(ln == 10);
  CHECK(out[0] == 2 && out[1] == 3);
  CHECK(out[2] == 15 && out[3] == 8 && out[4] == 1 && out[5] == -1);
  CHECK(out[6] == 1 /*var*/ && out[7] == 1 /*unitary*/ && out[9] == 0 /*dense*/);
}

/* Queue indices count var and const gates independently, in tape order. */
static void test_fuse_queue_indices() {
  std::vector<Row> rows = {
      {0, 0, 1, 0, 1, 0, -1, -1, -1},
      {0, 1, 1, 0, 1, 1, -1, -1, -1},
      {0, 0, 1, 0, 1, 2, -1, -1, -1},
      {0, 1, 1, 0, 1, 3, -1, -1, -1},
  };
  auto tape = flatten(rows);
  int32_t out[512];
  int32_t ln = dqc_fuse_tape(tape.data(), (int32_t)rows.size(), 7, 7, out, 512);
  CHECK(ln == 3 + 4 * 9);
  // gates: [const#0, var#0, const#1, var#1]
  CHECK(out[3 + 0 * 9 + 0] == 0 && out[3 + 0 * 9 + 1] == 0);
  CHECK(out[3 + 1 * 9 + 0] == 1 && out[3 + 1 * 9 + 1] == 0);
  CHECK(out[3 + 2 * 9 + 0] == 0 && out[3 + 2 * 9 + 1] == 1);
  CHECK(out[3 + 3 * 9 + 0] == 1 && out[3 + 3 * 9 + 1] == 1);
}

static void test_fuse_capacity_error() {
  std::vector<Row> rows = {{0, 0, 1, 0, 1, 0, -1, -1, -1}};
  auto tape = flatten(rows);
  int32_t out[4];
  CHECK(dqc_fuse_tape(tape.data(), 1, 4, 7, out, 4) == -1);  // capacity overflow -> -1
}

/* Distribution: gates on local qubits need no swaps; a gate on a global
 * (top-k) qubit forces a swap block first, and the final layout is
 * reported. */
static void test_plan_distribution() {
  std::vector<Row> rows = {
      {0, 1, 1, 0, 1, 0, -1, -1, -1},   // local
      {0, 1, 1, 0, 1, 7, -1, -1, -1},   // global at n=8, k=1 (qubit 7 sharded)
      {2, 0, 0, 1, 1, 7, -1, -1, -1},   // density on it
  };
  auto tape = flatten(rows);
  int32_t out[512];
  int32_t final_phys[8];
  int32_t ln = dqc_plan_distribution(tape.data(), (int32_t)rows.size(), 8, 1,
                                     out, 512, final_phys);
  CHECK(ln > 0);
  // first record: local apply at physical position 0
  CHECK(out[0] == 1 && out[5] == 1 && out[6] == 0);
  // a swap must appear before the second gate
  int32_t i = 10;
  CHECK(out[i] == 2);
  // the final layout is a permutation of 0..7
  bool seen[8] = {false};
  for (int q = 0; q < 8; ++q) {
    CHECK(0 <= final_phys[q] && final_phys[q] < 8);
    if (final_phys[q] >= 0 && final_phys[q] < 8) seen[final_phys[q]] = true;
  }
  for (int q = 0; q < 8; ++q) CHECK(seen[q]);
}

/* 2^k devices on too few qubits: the device block cannot fit locally. */
static void test_plan_distribution_error() {
  std::vector<Row> rows = {{0, 0, 1, 0, 1, 0, -1, -1, -1}};
  auto tape = flatten(rows);
  int32_t out[64];
  int32_t final_phys[4];
  CHECK(dqc_plan_distribution(tape.data(), 1, 4, 3, out, 64, final_phys) == -2);  // invalid input (m < k) -> -2
}

int main() {
  test_version();
  test_fuse_basic();
  test_fuse_cross();
  test_fuse_cross_k3();
  test_fuse_queue_indices();
  test_fuse_capacity_error();
  test_plan_distribution();
  test_plan_distribution_error();
  if (failures) {
    std::fprintf(stderr, "%d check(s) failed\n", failures);
    return 1;
  }
  std::printf("all planner checks passed\n");
  return 0;
}
