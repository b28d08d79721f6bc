#!/bin/bash
# Round-4 batch runner: regenerate CPU refs (tmp was wiped), then run the
# queued r41 and r42 TPU batches sequentially. Refs are generated BEFORE
# any TPU timing so no CPU-side work overlaps the timed loops (the r40
# run0 pollution lesson).
set -x
cd /root/repo
mkdir -p /tmp/r29_refs /tmp/r40_refs /tmp/r42_refs
python scripts/cpu_refs_helper.py /tmp/r29_refs/small.npz small
python scripts/cpu_refs_helper.py /tmp/r29_refs/kitti4.npz kitti4
python scripts/cpu_refs_helper.py /tmp/r40_refs/d256.npz d256
python scripts/cpu_refs_helper.py /tmp/r40_refs/mindisp.npz mindisp
python scripts/cpu_refs_helper.py /tmp/r42_refs/d512.npz d512
echo "=== refs done $(date) ==="
python scripts/tpu_batch_r41.py > scripts/tpu_r41_log.txt 2>&1
echo "=== r41 done $(date) rc=$? ==="
python scripts/tpu_batch_r42.py > scripts/tpu_r42_log.txt 2>&1
echo "=== r42 done $(date) rc=$? ==="
