#!/bin/bash
# Round-3 on-chip A/B queue, part 2 (resumed after session interruption).
# Run ALONE on the TPU — concurrent CPU load corrupts host-side timings.
set -x
cd /root/repo

# slot_bucketing A/B, BACK-TO-BACK so rig variance cancels
timeout 2400 python bench.py > /tmp/r3q_plain.out 2> /tmp/r3q_plain.err
BENCH_SLOT_BUCKETING=1 timeout 2400 python bench.py \
  > /tmp/r3q_slotbucket.out 2> /tmp/r3q_slotbucket.err

# BASELINE config 3: TTFA at concurrency 8 WITHOUT admission queueing
timeout 1800 python tools/stream_ttfa.py --concurrency 8 --requests 8 \
  > /tmp/r3q_ttfa_base.out 2>&1
BENCH_SEG_FIRST_BATCH1=1 timeout 1800 python tools/stream_ttfa.py --concurrency 8 --requests 8 \
  > /tmp/r3q_ttfa_b1.out 2>&1

# ragged-vs-dense matrix completion (s32 rerun for the lost 1024 row, s64)
for S in 32 64; do
  timeout 3600 python tools/bench_prod_step.py --slots $S --steps 16 \
    --bounds 256,1024 --variants int8+unroll,int8+ragged \
    > /tmp/r3q_ragged_s$S.out 2>&1
done

# stage-isolated MRF timings (stage-0 split vs per-block)
timeout 1800 python tools/bench_vocoder.py --stages --buckets 640 \
  > /tmp/r3q_mrf.out 2>&1

# BASELINE config 5: server load
timeout 2400 python tools/bench_server.py --requests 24 \
  > /tmp/r3q_server.out 2>&1

echo QUEUE_DONE
