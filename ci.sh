#!/usr/bin/env bash
# CI gate — the repo's analogue of the reference's workflow
# (/root/reference/.github/workflows/ci.yml:12-43: test matrix + clippy
# -Dwarnings + rustfmt).  One command, green or dead:
#
#   ./ci.sh          # native build + lint + fast suite
#   ./ci.sh --full   # additionally the slow (interpret-parity) tier
#
# Also wired as .github/workflows/ci.yml for GitHub-hosted runs.
set -euo pipefail
cd "$(dirname "$0")"

echo "== native build (warnings are errors) =="
make -C native clean >/dev/null
CXXFLAGS="-O2 -std=c++17 -fPIC -Wall -Wextra -Werror" make -C native

echo "== lint (pyflakes-level: syntax + undefined names) =="
python -m pyflakes osm_renderer_tpu tools bench.py __graft_entry__.py 2>/dev/null \
  || python - <<'EOF'
# pyflakes may be absent; fall back to a compile-only sweep.
import compileall, sys
ok = compileall.compile_dir("osm_renderer_tpu", quiet=2) \
    and compileall.compile_dir("tools", quiet=2) \
    and compileall.compile_file("bench.py", quiet=2) \
    and compileall.compile_file("__graft_entry__.py", quiet=2)
sys.exit(0 if ok else 1)
EOF

echo "== fast suite =="
python -m pytest tests/ -q -m "not slow"

if [[ "${1:-}" == "--full" ]]; then
  echo "== slow suite (interpret-mode device parity) =="
  python -m pytest tests/ -q -m "slow"
fi

echo "CI gate: green"
