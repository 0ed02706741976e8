#!/bin/sh
# One-shot chip measurement session: every PENDING device number, in
# priority order, each under its own timeout so a wedged tunnel can't eat
# the whole session. Run whenever the axon tunnel is live.
#
# Pending rows (PERF.md / TODO.md round-3 ledger):
#   1. Prefix-scan sync-tail A/B (QPSK/BPSK/OFDM4) — new this round.
#   2. NEURAL _demod_td throughput (rebuilt all-matmul path, CPU-validated).
#   3. FSK9600 re-measure after _mm_taps 513 -> 129.
#   4. FSK19200 at batch 64 (does it still degrade? ledger question).
#   5. Full honest matrix refresh + kernel smoke artifact.
set -x
cd "$(dirname "$0")/.."

timeout 1800 python benchmarks/sync_prefix_ab.py --modes QPSK,BPSK,OFDM4 \
  || echo "SYNC-PREFIX-AB FAILED"
timeout 1800 python benchmarks/honest.py --modes NEURAL \
  --out benchmarks/honest_neural.json || echo "NEURAL FAILED"
timeout 1800 python benchmarks/honest.py --modes FSK9600,FSK19200 \
  --out benchmarks/honest_fsk_refresh.json || echo "FSK REFRESH FAILED"
timeout 1800 python benchmarks/honest.py --modes FSK19200 --batch 64 \
  --out benchmarks/honest_fsk19200_b64.json || echo "FSK19200 B64 FAILED"
timeout 3600 python benchmarks/honest.py --out benchmarks/honest_results.json \
  || echo "FULL MATRIX FAILED"
timeout 1200 python bench.py --smoke || echo "SMOKE FAILED"
timeout 1800 python benchmarks/honest.py --modes OFDM4,OFDM8 \
  --out benchmarks/honest_ofdm_rows.json || echo "OFDM ROWS FAILED"
