#!/bin/bash
# Round-5 r55 runner: CPU refs first, then the TPU exactness batch.
set -x
cd /root/repo
mkdir -p /tmp/r55_refs
python scripts/cpu_refs_helper.py /tmp/r55_refs/kitti4.npz kitti4
python scripts/cpu_refs_helper.py /tmp/r55_refs/d512.npz d512
echo "=== refs done $(date) ==="
python scripts/tpu_batch_r55.py > scripts/tpu_r55_log.txt 2>&1
echo "=== r55 done $(date) rc=$? ==="
