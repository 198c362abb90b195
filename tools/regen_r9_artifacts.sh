#!/bin/bash
# Regenerate the round-9 unique-profile evidence artifacts on final
# code (the perf work changed the dedup/winnow plans the committed
# versions measured). Run ALONE — concurrent Spark jobs inflate walls.
set -e
cd /root/repo

echo "== dup profile sweep =="
python tools/dup_profile_sweep.py 2>/tmp/regen_dup.log > /tmp/dup_sweep.json
echo "== minhash accounting (unique profiles) =="
python tools/minhash_accounting.py .data/sf1u .data/sf10u 2>/tmp/regen_mh.log > /tmp/mh_acct.jsonl
echo "== spill audit sf10u =="
python tools/spill_audit.py .data/sf10u 2>/tmp/regen_spill.log > /tmp/spill.jsonl
echo "== pipeline accounting sf10u =="
python tools/pipeline_accounting.py --sf-dir /root/repo/.data/sf10u --batches 4 \
  --out PIPELINE_r9.json 2>/tmp/regen_pipe.log >/dev/null
echo "done"
