/* dqc_planner — native circuit-tape compiler for dqc_tpu.
 *
 * C++ counterpart of the reference's Rust instruction-tape layer
 * (reference src/circuit.rs:53-162): where the reference's native code
 * *interprets* the tape against CUDA kernels, here the native code
 * *compiles* it — gate fusion into qubit-group blocks (mirrors
 * dqc_tpu/circuit/fusion.py) and distributed qubit-layout planning with
 * Belady swap placement (mirrors dqc_tpu/parallel/layout.py). The XLA/TPU
 * executable itself is produced by JAX from the compiled program; this
 * library is the host-side scheduler in the build/trace path.
 *
 * ABI: plain C functions over int32 buffers (ctypes-friendly; no pybind11).
 *
 * Input tape encoding: one row of TAPE_W int32 per instruction:
 *   [kind, var, unitary, diff, k, p0, p1, p2, p3]
 *   kind: 0 = dense gate, 1 = diagonal gate, 2 = density request
 *   positions p0.. are msb-first; unused slots = -1.
 *
 * Fusion output stream (int32, tagged records):
 *   [1, group, m] + m * [var, queue_idx, diag, unitary, k, r0, r1, r2, r3]
 *   [2, pos2, pos1, var, unitary, queue_idx, diag]          (cross gate)
 *   [3, diff, k, p0, p1, p2, p3]                            (density)
 *
 * Distribution output stream (int32, tagged records):
 *   [1, kind, var, unitary, queue_idx, k, q0, q1, q2, q3]   (apply, phys pos)
 *   [2, kswap, s0, ..., s{kswap-1}]                         (swap block)
 *   [3, diff, dens_idx, k, q0, q1, q2, q3]                  (density)
 */

#ifndef DQC_PLANNER_H
#define DQC_PLANNER_H

#include <cstdint>

extern "C" {

#define DQC_TAPE_W 9

/* Fuse a tape into group blocks. Returns number of int32 written to `out`
 * (capacity `out_cap`), or -1 on error / insufficient capacity. */
int32_t dqc_fuse_tape(const int32_t* tape, int32_t num_instr, int32_t n_qubits,
                      int32_t group_bits, int32_t* out, int32_t out_cap);

/* Plan a distributed execution over 2^k devices. Returns number of int32
 * written, or -1 on error. `final_phys` (length n) receives the final
 * logical->physical slot map. */
int32_t dqc_plan_distribution(const int32_t* tape, int32_t num_instr,
                              int32_t n_qubits, int32_t k_device_bits,
                              int32_t* out, int32_t out_cap,
                              int32_t* final_phys);

/* Library ABI version. */
int32_t dqc_planner_version(void);
}

#endif /* DQC_PLANNER_H */
