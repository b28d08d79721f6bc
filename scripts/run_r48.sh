#!/bin/bash
# Round-5 batch-B runner: CPU refs FIRST (no CPU work overlapping timed
# loops — the r40 lesson), then the r48 TPU batch.
set -x
cd /root/repo
mkdir -p /tmp/r48_refs
python scripts/cpu_refs_helper.py /tmp/r48_refs/tsukuba.npz tsukuba
python scripts/cpu_refs_helper.py /tmp/r48_refs/tsukuba_lr.npz tsukuba_lr
python scripts/cpu_refs_helper.py /tmp/r48_refs/tsukuba_b11.npz tsukuba_b11
python scripts/cpu_refs_helper.py /tmp/r48_refs/kitti4_ap2.npz kitti4_ap2
echo "=== refs done $(date) ==="
python scripts/tpu_batch_r48.py > scripts/tpu_r48_log.txt 2>&1
echo "=== r48 done $(date) rc=$? ==="
