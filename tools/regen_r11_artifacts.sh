#!/bin/bash
# Regenerate the round-11 evidence artifacts on final code. Run ALONE
# — concurrent Spark jobs inflate walls (round-9 order-sensitivity
# finding). Mirrors tools/regen_r10_artifacts.sh with the round-11
# artifact names; AB_REF defaults to the round-10 close.
set -u
cd /root/repo
AB_REF=${AB_REF:-932ce31}   # round-10 close

echo "== plan lint (incl. round-11 estimate-blind-broadcast rule) =="
python tools/plan_lint.py --out PLAN_LINT_r11.json 2>/tmp/regen_lint.log >/dev/null || echo "STEP FAILED: plan_lint"

echo "== sql-text sweep =="
python tools/sql_text_sweep.py 2>/tmp/regen_sqltext.log | tail -1 > SQLTEXT_r11.json || echo "STEP FAILED: sqltext"

echo "== full sweep sf1 (value compare) =="
python tools/scale_sweep.py --sf-dir .data/sf1 --out SWEEP_r11_sf1.json \
  2>/tmp/regen_sw1.log >/dev/null || echo 'STEP FAILED: sweep_sf1'

echo "== sf10 value-sweep tail (verdict item 5: the 100 deferred queries) =="
python tools/scale_sweep.py --sf-dir .data/sf10 \
  --max-compare-rows 2000000 \
  --only "$(python -c "import json; print(','.join(sorted(json.load(open('SWEEP_r10_sf10.json'))['unswept'])))")" \
  --out SWEEP_r11_sf10_tail.json 2>/tmp/regen_sw10.log >/dev/null || echo 'STEP FAILED: sweep_sf10_tail'

echo "== dedup-family sweep sf10u (value compare where the oracle fits) =="
python tools/scale_sweep.py --sf-dir .data/sf10u \
  --only q_dedup_exact,q_dedup_resolve,q_substring_dedup,q_segment_dedup_clean,q_contamination_screen,q_dup_cluster_stats,q_similarity_join \
  --max-compare-rows 2000000 \
  --skip-oracle "q_similarity_join=brute-force O(n^2) oracle self-join infeasible at 377k distinct; value-checked by SSJOIN_XCHECK_r10 (independent MinHash-banded path, code unchanged this round)" \
  --out SWEEP_r11_sf10u.json 2>/tmp/regen_sw10u.log >/dev/null || echo 'STEP FAILED: sweep_sf10u'

echo "== dup-profile sweep, ISOLATED sessions =="
python tools/dup_profile_sweep.py --isolate 2>/tmp/regen_dup.log > /tmp/dup_sweep.json || echo "STEP FAILED: dup_sweep"

echo "== minhash accounting (unique profiles; rewrite must not move counts) =="
python tools/minhash_accounting.py .data/sf1u .data/sf10u \
  2>/tmp/regen_mh.log > /tmp/mh_acct.jsonl || echo 'STEP FAILED: mh_acct'

echo "== spill audit sf10u =="
python tools/spill_audit.py .data/sf10u 2>/tmp/regen_spill.log > /tmp/spill.jsonl || echo "STEP FAILED: spill"

echo "== interleaved full-surface A/B vs ${AB_REF} at sf10 (verdict item 2) =="
python tools/bench_ab.py --ref-a "${AB_REF}" --passes 3 \
  --sf-dir /root/repo/.data/sf10 --out BENCHDIFF_r11.json \
  2>/tmp/regen_ab.log >/dev/null || echo 'STEP FAILED: bench_ab'

echo "== ALS fit-iteration floor (verdict item 7) =="
python tools/als_floor.py /root/testdata/sf0.1 .data/sf10 \
  2>/tmp/regen_als.log > ALS_FLOOR_r11.json || echo 'STEP FAILED: als_floor'

echo "== driver-contract bench =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py 2>/tmp/regen_b01.log > BENCH_r11_sf01.json || echo "STEP FAILED: bench01"

echo "done — assemble SCALING_DUP_r11 / MINHASH_ACCOUNTING_r11 / SPILL_r11"
echo "from the /tmp intermediates with round notes."
