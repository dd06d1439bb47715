#!/bin/bash
# Serialized TPU measurement queue v2: waits on the exact python PID in $1.
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 30; done
echo "=== 2^24 try5 (pid $1) done: $(date)"
echo "=== keccak-air 2^20 (BASELINE config 4)"
TPU_STARK_TIMING=1 timeout 7200 python bench_keccak_air.py 20 bench 1 > _r3_logs/keccak_air_2p20.log 2>&1
echo "rc=$? $(date)"
echo "=== poseidon2-chain 2^18 (BASELINE config 3)"
TPU_STARK_TIMING=1 timeout 5400 python bench_poseidon2_chain.py 18 > _r3_logs/poseidon2_chain_2p18.log 2>&1
echo "rc=$? $(date)"
echo "=== 2^20 zk production A/B: vpu4 (default)"
TPU_STARK_TIMING=1 timeout 5400 python bench_prove.py 20 keccak zk 2 bench > _r3_logs/prove_2p20_vpu4.log 2>&1
echo "rc=$? $(date)"
echo "=== 2^20 zk production A/B: mxu"
TPU_STARK_NTT_NARROW=mxu TPU_STARK_TIMING=1 timeout 5400 python bench_prove.py 20 keccak zk 2 bench > _r3_logs/prove_2p20_mxu.log 2>&1
echo "rc=$? $(date)"
echo "=== queue2 done $(date)"
