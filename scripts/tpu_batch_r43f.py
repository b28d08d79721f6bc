"""Round-4 TPU batch #43f: bisect the sgm4 default regression.

r43e: today's sgm4 default is 89.19 fps (x2) vs 98.4 measured at r40 —
a ~1.1 ms/frame regression; the kitti8 control is unchanged (76.61). The
only kernel-touching commit between r40's code state and HEAD is
a32aeb8 (pack-shift generalization for D=512). Bench sgm4 from archived
checkouts of a32aeb8~1 and a32aeb8 in SUBPROCESSES (fresh jax each, no
cache crosstalk) to localize the regression.
"""
import json, os, subprocess, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
RESULTS = "scripts/tpu_r43f_results.json"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

SNIPPET = r"""
import json, sys
sys.path.insert(0, sys.argv[1])
from tpustereo.config import PRESETS
from tpustereo.eval.bench import run_benchmark
r = run_benchmark(PRESETS["middlebury_sgm4"], shape=(375, 1242), batch=8,
                  iters=20)
print("RESULT " + json.dumps({k: r[k] for k in ("value", "ms_per_frame")}))
"""

def main():
    t0 = time.time()
    for name, ref in (("pre_a32aeb8", "a32aeb8~1"), ("at_a32aeb8",
                                                     "a32aeb8")):
        d = f"/tmp/bisect_{name}"
        try:
            os.makedirs(d, exist_ok=True)
            subprocess.run(
                f"git archive {ref} tpustereo | tar -x -C {d}",
                shell=True, check=True, cwd="/root/repo")
            p = subprocess.run([sys.executable, "-c", SNIPPET, d],
                               capture_output=True, text=True,
                               timeout=3600, cwd=d)
            line = [ln for ln in p.stdout.splitlines()
                    if ln.startswith("RESULT ")]
            if line:
                rec(f"bench/sgm4_{name}", json.loads(line[-1][7:]))
            else:
                rec(f"error/{name}", (p.stdout[-300:] + p.stderr[-300:]))
        except Exception as e:
            rec(f"error/{name}", repr(e)[:500])
    rec("total_wall_s", round(time.time() - t0, 1))

if __name__ == "__main__":
    sys.exit(main())
