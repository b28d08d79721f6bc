#!/bin/bash
# Round-5 batch r61 runner: CPU refs FIRST (no CPU work overlapping timed
# loops — the r40 lesson), then the TPU batch.
set -x
cd /root/repo
mkdir -p /tmp/r61_refs
python scripts/cpu_refs_helper.py /tmp/r61_refs/kitti4_ap2.npz kitti4_ap2
echo "=== refs done $(date) ==="
python scripts/tpu_batch_r61.py > scripts/tpu_r61_log.txt 2>&1
echo "=== r61 done $(date) rc=$? ==="
