#!/bin/bash
# Round-5b TPU measurement queue: rebuild-kernel probe, then the
# pack2/static sweep variants.  Run serially (one chip).
cd /root/repo
log=/tmp/queue_r5b.log
echo "=== queue start $(date +%T)" >> $log
timeout 2400 python -u benchmarks/probe_rebuild2.py >> $log 2>&1
echo "=== probe_rebuild2 done $(date +%T) rc=$?" >> $log
timeout 4800 python -u benchmarks/r5_sweep.py pack2_12_6_36 \
    pack2_static pack2_static_lc20 pack2_lc20 pack2_sk16_c96 \
    pack2_sk20_c112 pack2_rb72 pack2_static_sk08_c64 >> $log 2>&1
echo "=== r5_sweep pack2 done $(date +%T) rc=$?" >> $log
echo "=== queue COMPLETE $(date +%T)" >> $log
