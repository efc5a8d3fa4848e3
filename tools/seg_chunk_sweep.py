"""30q depth-100 segment-chunk sweep (VERDICT r4 #3 / r5 queue).

The 30q bench line runs segmented in 25-layer chunks — a constant chosen
in round 3 for watchdog headroom, never swept. The chunk size is the one
knob trading per-segment fixed costs (dispatch + donation boundaries +
partial-pipeline ramp) against single-execution watchdog risk (the axon
backend kills executions past ~60-80 s; round-4 measured 48L = 38 s OK,
100L single call = killed). Each point runs bench.py in a fresh
subprocess (the 30q program needs the chip's full HBM) with
DQC_BENCH_SEG_CHUNK overridden; storage sweepable too (mixed vs f16 —
identical memory, f16 is ~7x more accurate; speed parity checked here).

Usage:  python tools/seg_chunk_sweep.py [storage=mixed] [chunks=10,20,25,33,50]
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, ".")

BENCH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     "bench.py")


def run_point(chunk: int, storage: str) -> dict:
    env = dict(os.environ,
               DQC_BENCH_QUBITS="30", DQC_BENCH_STORAGE=storage,
               DQC_BENCH_LAYERS="100", DQC_BENCH_SEG_CHUNK=str(chunk),
               DQC_BENCH_30Q="0", DQC_BENCH_PREFLIGHT="0")
    try:
        out = subprocess.run([sys.executable, BENCH], env=env,
                             capture_output=True, text=True, timeout=3000)
        line = next((l for l in out.stderr.splitlines()
                     if l.startswith("# detail: ")), None)
        if line:
            return json.loads(line[len("# detail: "):])
        return {"error": f"rc={out.returncode} "
                         f"{(out.stderr or out.stdout)[-300:]}"}
    except Exception as e:
        return {"error": f"{type(e).__name__}: {str(e)[:200]}"}


def main():
    storage = sys.argv[1] if len(sys.argv) > 1 else "mixed"
    chunks = [int(c) for c in
              (sys.argv[2] if len(sys.argv) > 2 else "10,20,25,33,50").split(",")]
    print(f"30q x 100L segment-chunk sweep, storage={storage}")
    print("\n| chunk | s/step | gates/s | compile+warm s |")
    print("|---|---|---|---|")
    for c in chunks:
        d = run_point(c, storage)
        if "error" in d:
            print(f"| {c} | FAIL {d['error'][:120]} |", flush=True)
        else:
            print(f"| {c} | {d['sec_per_grad_step']:.1f} "
                  f"| {d['gates_per_sec']:.1f} "
                  f"| {d['compile_and_warm_s']:.0f} |", flush=True)


if __name__ == "__main__":
    main()
