"""Round-3 TPU batch #29b: empirical VPU issue calibration for the
roofline — measured cross-lane (roll) vs elementwise (ALU) op cost, wide
(throughput, 156 vregs) and narrow (latency, 1 vreg). Turns the roofline's
assumed roll-penalty bracket into a measured ratio."""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

RESULTS = "scripts/tpu_r29b_results.json"
results = {}


def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)


def main():
    t0 = time.time()
    import jax
    import jax.numpy as jnp
    from tpustereo.eval.bench import _timed_device_loop
    from tpustereo.kernels.width_micro import elem_chain_micro, roll_chain_micro
    rec("device", str(jax.devices()[0].device_kind))
    rng = np.random.default_rng(0)
    CH = 256
    for name, shape in (("wide_1248x128", (1248, 128)),
                        ("narrow_8x128", (8, 128))):
        try:
            x = jnp.asarray(rng.integers(0, 1000, shape).astype(np.int32))
            s_roll = _timed_device_loop(
                lambda v: roll_chain_micro(v, CH), x, iters=10)
            s_elem = _timed_device_loop(
                lambda v: elem_chain_micro(v, CH), x, iters=10)
            # elem chain body is 3 ops/iter (add, add, min), roll is 1/iter
            roll_ns = s_roll / CH * 1e9
            alu_ns = s_elem / (3 * CH) * 1e9
            rec(f"issue/{name}",
                {"roll_ns_per_op": round(roll_ns, 2),
                 "alu_ns_per_op": round(alu_ns, 2),
                 "roll_vs_alu": round(roll_ns / alu_ns, 2)})
        except Exception as e:  # noqa: BLE001
            rec(f"error/{name}", repr(e)[:400])
            traceback.print_exc()
    rec("total_wall_s", round(time.time() - t0, 1))


if __name__ == "__main__":
    sys.exit(main())
