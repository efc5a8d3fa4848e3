"""Capture a jax.profiler trace of the hot kernels and report DEVICE-side
op durations — hardware-accounted bandwidth instead of the engine's
schedule estimate (VERDICT r3 weak 3: "achieved-bandwidth remains
self-reported").

Traces (a) a chain of production dual-kernel passes and (b) one full
layer-scanned fwd+grad step at the bench shape, then parses the xplane
protobuf with tensorboard_plugin_profile (no tensorboard server needed)
and prints the top device ops by total self time. Moved bytes per dual
pass are exact (2 read + 2 written f32 planes), so

    achieved GB/s = moved / (device self-time per pass)

is a pure hardware measurement.

Usage:  python tools/trace_step.py [n=26] [reps=20] [layers=0]
        (layers > 0 additionally traces a full n x layers step)
"""

import glob
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

HBM_GBPS = 819.0


def _fetch(x):
    leaves = jax.tree_util.tree_leaves(x)
    jax.block_until_ready(leaves)
    float(jnp.sum(leaves[0][(0,) * (leaves[0].ndim - 1)][:1]
                  if leaves[0].ndim > 1 else leaves[0][:1]))


def parse_xplane(logdir):
    """Return [(op_name, total_self_us, occurrences)] from the newest
    xplane.pb under ``logdir``, via the tensorboard profile plugin's
    converter (framework op stats table)."""
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise RuntimeError(f"no xplane.pb under {logdir}")
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    for tool in ("framework_op_stats^", "tensorflow_stats^"):
        try:
            data = rtd.xspace_to_tool_data([paths[-1]], tool, {})
            break
        except Exception as e:
            err = e
    else:
        raise RuntimeError(f"no op-stats tool worked: {err}")
    if isinstance(data, tuple):
        data = data[0]
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    # gviz JSON: two tables (device, host) separated; take rows with
    # device placement. The converter emits a JSON array of tables or a
    # single gviz string depending on version — handle both.
    rows = []
    try:
        payload = json.loads(data)
    except Exception:
        # "gviz" JS string: find the embedded JSON rows crudely
        payload = None
    if payload is None:
        return [("(unparsed — raw length %d)" % len(data), 0.0, 0)]
    tables = payload if isinstance(payload, list) else [payload]
    for tbl in tables:
        cols = [c.get("label", c.get("id", "")) for c in tbl.get("cols", [])]
        for r in tbl.get("rows", []):
            vals = [c.get("v") for c in r.get("c", [])]
            d = dict(zip(cols, vals))
            name = d.get("Type") or d.get("Operation") or d.get("Op name")
            total = (d.get("Total self-time (us)")
                     or d.get("Total self time (us)")
                     or d.get("total_self_time_us") or 0)
            occ = d.get("#Occurrences") or d.get("Occurrences") or 0
            host = d.get("Host/device") or d.get("Device")
            if name and (host in (None, "Device", "device")):
                rows.append((str(name), float(total or 0), int(occ or 0)))
    rows.sort(key=lambda t: -t[1])
    return rows


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 26
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    layers = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    logdir = os.environ.get("DQC_TRACE_DIR", "/tmp/dqc_trace")

    from dqc_tpu.ops.pallas.dual_apply import dual_group_apply_planes

    A = 1 << (n - 14)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    mk = jax.jit(lambda k: jax.random.normal(k, (A, 128, 128), jnp.float32))
    xr, xi = mk(ks[0]), mk(ks[1])
    e = jax.jit(lambda k: jax.random.normal(
        k, (128, 128, 4), jnp.float32) / 11.3)(ks[2])
    el_r, el_i, em_r, em_i = (e[..., i] for i in range(4))

    def chain(a, b):
        def body(_, c):
            return dual_group_apply_planes(c[0], c[1], el_r, el_i, em_r,
                                           em_i)
        return jax.lax.fori_loop(0, reps, body, (a, b))

    j = jax.jit(chain)
    _fetch(j(xr, xi))  # compile + warm OUTSIDE the trace
    moved = 4 * xr.size * 4

    jax.profiler.start_trace(logdir)
    t0 = time.time()
    out = j(xr, xi)
    _fetch(out)
    wall = time.time() - t0
    if layers > 0:
        from dqc_tpu.models.hardware_efficient import HardwareEfficientAnsatz

        model = HardwareEfficientAnsatz(n, layers, entangler="cz", scan=True)
        params = model.init_params(jax.random.PRNGKey(1))
        step = jax.jit(jax.value_and_grad(model.magnetization))
        v, g = step(params)
        _fetch((v, g))
        jax.profiler.stop_trace()
        print(f"# traced {reps} dual passes + one {n}q x {layers}L step")
    else:
        jax.profiler.stop_trace()
        print(f"# traced {reps} dual passes; wall {wall:.3f}s -> "
              f"{wall / reps * 1e3:.2f} ms/pass wall, "
              f"{moved / (wall / reps) / 1e9:.1f} GB/s wall")

    rows = parse_xplane(logdir)
    print("\n| device op | total self us | n | us/occurrence | GB/s if dual |")
    print("|---|---|---|---|---|")
    for name, total, occ in rows[:15]:
        per = total / occ if occ else 0.0
        gbps = moved / (per * 1e-6) / 1e9 if per > 0 else 0.0
        print(f"| {name[:60]} | {total:10.1f} | {occ} | {per:9.1f} "
              f"| {gbps:7.1f} |")


if __name__ == "__main__":
    main()
