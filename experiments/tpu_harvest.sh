#!/bin/bash
# One-shot TPU validation harvest — run when the axon tunnel is back.
# Covers the round-2 TPU-validation debt (CLAUDE.md round-state notes):
#   1. fresh official bench number (+ per-stage speed-of-light table)
#   2. frontend precision-pin parity: pallas vs xla demod on real TPU
#      (the bf16 selector-dot bug was invisible to CPU interpret tests)
#   3. barrier A/B including the newly tagged frontend site
# Each step is independently time-bounded; partial results still land in
# the named logs.
set -u
cd "$(dirname "$0")/.."

echo "== 1. tunnel probe"
timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
print('devices:', jax.devices())
print(np.asarray((jnp.arange(16.0)*2)[:4]))" || {
  echo 'tunnel still down; aborting'; exit 1; }

echo "== 2. bench (fresh number + SoL table)"
timeout 900 python bench.py --stats 2>bench_tpu.log
tail -5 bench_tpu.log

echo "== 3. frontend parity on real TPU (pallas vs xla, same fixture)"
timeout 600 python - <<'EOF'
import numpy as np, jax, jax.numpy as jnp
from real_time_sdr_tpu.models.receiver import Receiver
from real_time_sdr_tpu.utils import synth
out = {}
for impl in ("xla", "pallas"):
    rx = Receiver(0, stereo=True, rds=True, pll_tier=3, frontend_impl=impl)
    iq, _ = synth.station_iq(rx.cfg, 8)
    _, o = rx.jit_step(rx.init_state(), jnp.asarray(iq))
    out[impl] = np.asarray(o.left)
ref, got = out["xla"], out["pallas"]
snr = 10*np.log10(np.mean(ref**2) / (np.mean((ref-got)**2) + 1e-30))
print(f"pallas-vs-xla audio SNR on TPU: {snr:.1f} dB "
      f"(pre-fix the bf16 selector comb capped this; expect >80 dB now)")
EOF

echo "== 4. barrier A/B: frontend site"
timeout 1200 python experiments/barrier_ab.py --only baseline,no-frontend \
    2>&1 | tail -8

echo "== done; record numbers in BENCH_NOTES.md"
