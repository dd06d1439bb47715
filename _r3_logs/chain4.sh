#!/bin/bash
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 30; done
echo "=== try6 done: $(date)"
echo "=== keccak-air 2^20 (retry, serialized quotient)"
TPU_STARK_TIMING=1 timeout 6000 python bench_keccak_air.py 20 bench 1 > _r3_logs/keccak_air_2p20.log 2>&1
echo "rc=$? $(date)"
echo "=== poseidon2-chain 2^18"
TPU_STARK_TIMING=1 timeout 4200 python bench_poseidon2_chain.py 18 > _r3_logs/poseidon2_chain_2p18.log 2>&1
echo "rc=$? $(date)"
echo "=== 2^20 zk production vpu4"
TPU_STARK_TIMING=1 timeout 3600 python bench_prove.py 20 keccak zk 2 bench > _r3_logs/prove_2p20_vpu4.log 2>&1
echo "rc=$? $(date)"
echo "=== 2^20 zk production mxu"
TPU_STARK_NTT_NARROW=mxu TPU_STARK_TIMING=1 timeout 3600 python bench_prove.py 20 keccak zk 2 bench > _r3_logs/prove_2p20_mxu.log 2>&1
echo "rc=$? $(date)"
echo "=== chain4 done $(date)"
