#!/bin/bash
# Regenerate the round-10 evidence artifacts on final code. Run ALONE
# — concurrent Spark jobs inflate walls (the round-9 verdict's
# order-sensitivity finding is exactly this effect).
#
# Per the round-9 verdict item 7, the interleaved A/B bench is part of
# the default regen so every round ships a BENCHDIFF without a verdict
# task demanding it: set AB_REF to the previous round's close commit.
set -u  # per-step || guards instead of set -e: one failed step must not kill the chain
cd /root/repo
AB_REF=${AB_REF:-f36f8a7}   # round-9 close

echo "== plan lint =="
python tools/plan_lint.py --out PLAN_LINT_r10.json 2>/tmp/regen_lint.log >/dev/null || echo "STEP FAILED: plan_lint"

echo "== sql-text sweep =="
python tools/sql_text_sweep.py 2>/tmp/regen_sqltext.log | tail -1 > SQLTEXT_r10.json || echo "STEP FAILED: sqltext"

echo "== full sweep sf1 (value compare) =="
python tools/scale_sweep.py --sf-dir .data/sf1 --out SWEEP_r10_sf1.json \
  2>/tmp/regen_sw1.log >/dev/null || echo 'STEP FAILED: sweep_sf1'

echo "== full sweep sf10 (row-bounded value compare; judge item 4) =="
python tools/scale_sweep.py --sf-dir .data/sf10 \
  --max-compare-rows 2000000 \
  --skip-oracle "q_similarity_join=brute-force O(n^2) oracle self-join infeasible at 500k docs" \
  --out SWEEP_r10_sf10.json 2>/tmp/regen_sw10.log >/dev/null || echo 'STEP FAILED: sweep_sf10'

echo "== dedup-family sweep sf10u (value compare where the oracle fits) =="
python tools/scale_sweep.py --sf-dir .data/sf10u \
  --only q_dedup_exact,q_dedup_resolve,q_substring_dedup,q_segment_dedup_clean,q_contamination_screen,q_dup_cluster_stats,q_similarity_join \
  --max-compare-rows 2000000 \
  --skip-oracle "q_similarity_join=brute-force O(n^2) oracle self-join infeasible at 377k distinct; value-checked instead by SSJOIN_XCHECK_r10 (tools/ssjoin_crosscheck.py)" \
  --out SWEEP_r10_sf10u.json 2>/tmp/regen_sw10u.log >/dev/null || echo 'STEP FAILED: sweep_sf10u'

echo "== ssjoin independent value cross-check sf10u (judge item 3) =="
python tools/ssjoin_crosscheck.py --sf-dir .data/sf10u \
  --out SSJOIN_XCHECK_r10.json 2>/tmp/regen_xchk.log >/dev/null || echo 'STEP FAILED: xcheck'

echo "== dup-profile sweep, ISOLATED sessions (judge item 5) =="
python tools/dup_profile_sweep.py --isolate 2>/tmp/regen_dup.log > /tmp/dup_sweep.json || echo "STEP FAILED: dup_sweep"

echo "== minhash accounting (unique profiles; gate must not move counts) =="
python tools/minhash_accounting.py .data/sf1u .data/sf10u \
  2>/tmp/regen_mh.log > /tmp/mh_acct.jsonl || echo 'STEP FAILED: mh_acct'

echo "== spill audit sf10u (incl. the 1.2 GB verify-peak watch; judge item 6) =="
python tools/spill_audit.py .data/sf10u 2>/tmp/regen_spill.log > /tmp/spill.jsonl || echo "STEP FAILED: spill"

echo "== interleaved A/B bench vs ${AB_REF} at sf10 (judge item 7) =="
python tools/bench_ab.py --ref-a "${AB_REF}" --passes 3 \
  --sf-dir /root/repo/.data/sf10 --out BENCHDIFF_r10.json \
  2>/tmp/regen_ab.log >/dev/null || echo 'STEP FAILED: bench_ab'

echo "== triple bench =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py 2>/tmp/regen_b01.log > BENCH_r10_sf01.json || echo "STEP FAILED: bench01"
SPARK_GRAFT_SF_DIR=/root/repo/.data/sf1 python bench.py 2>/tmp/regen_b1.log > BENCH_r10_sf1.json || echo "STEP FAILED: bench1"
SPARK_GRAFT_SF_DIR=/root/repo/.data/sf10 python bench.py 2>/tmp/regen_b10.log > BENCH_r10_sf10.json || echo "STEP FAILED: bench10"

echo "done — assemble SCALING_DUP_r10.json / MINHASH_ACCOUNTING_r10.json /"
echo "SPILL_r10.json from the /tmp intermediates with round notes."
