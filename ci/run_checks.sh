#!/usr/bin/env bash
# The repo's one-command hermetic check (what CI and the Docker image run):
#   1. full test suite on a virtual 8-device CPU mesh (tests/conftest.py
#      forces the platform; includes golden-model byte-identity tests),
#   2. AddressSanitizer build + smoke of the native stitch library,
#   3. a CPU bench smoke proving bench.py's contract (one JSON line with
#      parity/fast/train tiers).
# The reference's counterpart is a MANUAL script needing a GPU box, docker
# images, and genome downloads (docker_test:6-46); this runs anywhere.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest (virtual 8-device CPU mesh) =="
python -m pytest tests/ -q

echo "== native ASAN smoke =="
make test-native-asan

echo "== bench smoke (CPU) =="
export HELEN_BENCH_BATCH=8 HELEN_BENCH_STEPS=2 \
       HELEN_BENCH_TRAIN_BATCH=4 HELEN_BENCH_TRAIN_STEPS=2 \
       HELEN_BENCH_E2E_IMAGES=32 HELEN_BENCH_E2E_BATCH=8 \
       HELEN_BENCH_E2E_WRITERS=1
BENCH_JSON=$(python bench.py)
echo "$BENCH_JSON"
python - "$BENCH_JSON" <<'EOF'
import json, sys
d = json.loads(sys.argv[1])
for k in ("metric", "value", "unit", "vs_baseline",
          "fast_windows_per_s_per_chip", "train_windows_per_s_per_chip",
          "e2e_images_per_s", "e2e_consensus_s", "e2e_store_write_s",
          "e2e_stitch_s"):
    assert k in d, f"bench.py output missing {k}"
assert d["value"] > 0 and d["train_windows_per_s_per_chip"] > 0
assert d["e2e_images_per_s"] > 0
print("bench contract OK")
EOF

echo "ALL CHECKS PASSED"
