#!/bin/sh
# Regenerate BENCH_DETAIL.json (VERDICT round-2 item 1): the on-chip kernel
# sweep + per-config throughput + the real-chip 1x1 scaling sanity row, the
# on-chip fused-vs-xla parity assertions (bench --verify, self-checking
# evidence for every fused-kernel row), then merge the virtual-8-device
# CPU-mesh collective-overhead rows (which must run in a separate process:
# the sandbox pins the TPU backend at interpreter start, so CPU selection
# needs a pre-import platform flip).
set -e
cd "$(dirname "$0")/.."

python tools/bench.py --verify --out TPU_VERIFY_r04.json

python tools/bench.py --batched-shapes \
    --configs config1 config2 config3 config4 config5 \
    --mesh 1x1 --out BENCH_DETAIL.json

python - <<'EOF'
import os, sys
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
import jax
from jax._src import xla_bridge as _xb
jax.config.update("jax_platforms", "cpu")
_xb._clear_backends()
assert len(jax.devices()) == 8, jax.devices()
sys.path.insert(0, "tools")
import bench
bench.main(["--skip-kernels", "--configs", "config3", "config4", "config5",
            "--mesh", "2x4", "--tag", "scaling_virtual_8dev",
            "--update", "--out", "BENCH_DETAIL.json"])
EOF
