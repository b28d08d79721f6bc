"""Split the midfull speckle compile hang: CC labelling alone vs the 4.5M
lax.sort pair alone vs component_big alone."""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

RESULTS = "scripts/tpu_probe_midfull2.json"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

def timed(name, fn):
    t0 = time.time()
    try:
        out = fn()
        out = [o.block_until_ready() for o in (out if isinstance(out, (tuple, list)) else [out])]
        rec(f"compile_s/{name}", round(time.time() - t0, 1))
        return out
    except Exception as e:
        rec(f"error/{name}", f"after {round(time.time()-t0,1)}s: " + repr(e)[:300])
        traceback.print_exc()
        return None

def main():
    import jax, jax.numpy as jnp
    rec("device", str(jax.devices()[0].device_kind))
    H, W = 1500, 3000
    n = H * W
    rng = np.random.default_rng(0)

    # a) lax.sort pair at 4.5M
    lab = jnp.asarray(rng.integers(0, n, (n,), dtype=np.int32))
    idx = jnp.arange(n, dtype=jnp.int32)
    timed("laxsort_pair_4p5M", lambda: jax.jit(
        lambda f: jax.lax.sort((f, idx), num_keys=1)[0])(lab))

    # b) CC labelling alone at 1500x3000 (banded)
    from tpustereo.kernels import connected_component_labels_pallas
    ch = jnp.asarray(rng.random((H, W - 1)) < 0.6)
    cv = jnp.asarray(rng.random((H - 1, W)) < 0.6)
    timed("cc_banded_1500x3000", lambda: jax.jit(
        lambda a, b: connected_component_labels_pallas(a, b))(ch, cv))

    # c) component_big alone at 4.5M
    from tpustereo.ops.postproc import component_big
    lab2 = jnp.asarray(rng.integers(0, n, (H, W), dtype=np.int32))
    timed("component_big_4p5M", lambda: jax.jit(
        lambda l: component_big(l, 100))(lab2))
    rec("done", True)

if __name__ == "__main__":
    sys.exit(main())
