#!/bin/bash
# Round-3 on-chip A/B queue (judge r2 items 1, 3, 4, 10). Run ALONE on the
# TPU — concurrent CPU load corrupts the host-side dispatch timings.
set -x
cd /root/repo

# item 4a: slot_bucketing e-book A/B (vs the plain run recorded separately)
BENCH_SLOT_BUCKETING=1 timeout 2400 python bench.py \
  > /tmp/ab_slotbucket.out 2> /tmp/ab_slotbucket.err

# items 3 + 10: TTFA baseline and batch-1 seg_first
timeout 1800 python tools/stream_ttfa.py --concurrency 8 --requests 16 \
  > /tmp/ab_ttfa_base.out 2>&1
BENCH_SEG_FIRST_BATCH1=1 timeout 1800 python tools/stream_ttfa.py --concurrency 8 --requests 16 \
  > /tmp/ab_ttfa_b1.out 2>&1

# item 1: ragged-vs-dense matrix (occupancy x fill)
for S in 8 32 64; do
  timeout 3600 python tools/bench_prod_step.py --slots $S --steps 16 \
    --bounds 256,1024 --variants int8+unroll,int8+ragged \
    > /tmp/ab_ragged_s$S.out 2>&1
done

# item 4b: stage-isolated MRF timings (stage-0 split vs per-block)
timeout 1800 python tools/bench_vocoder.py --stages --buckets 640 \
  > /tmp/ab_mrf_stages.out 2>&1

echo DONE
