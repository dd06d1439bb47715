#!/bin/bash
cd /root/repo
echo "=== mxu A/B leg: $(date)"
TPU_STARK_NTT_NARROW=mxu TPU_STARK_TIMING=1 timeout 4000 python bench_prove.py 20 keccak zk 2 bench > _r4_logs/prove_2p20_mxu.log 2>&1
echo "rc=$? $(date)"
echo "=== 2^24 warm rep: $(date)"
TPU_STARK_TIMING=1 TPU_STARK_COMMIT_GROUP_MB=512 timeout 10000 python bench_prove.py 24 keccak zk 1 bench > _r4_logs/prove_2p24.log 2>&1
echo "rc=$? $(date)"
echo "=== chain_r4 done $(date)"
