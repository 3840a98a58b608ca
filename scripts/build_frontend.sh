#!/usr/bin/env bash
# Frontend build glue — the `npm run build-for-django` equivalent.
#
# The serving stack ships a dependency-free single-file frontend
# (mmdx_tpu/serve/frontend/index.html), so no build step is required. To run
# the reference's full React/Vite SPA instead (swap-in proven in
# tests/test_spa_swapin.py), build it and point the server at the dist dir:
#
#   cd <reference>/frontend && npm ci && npm run build     # -> dist/
#   MMDX_FRONTEND_DIR=<reference>/frontend/dist PORT=8000 \
#       python -m mmdx_tpu.serve.wsgi
#
# The SPA's axios base URL is baked at build time (VITE_API_URL, reference
# frontend/src/api.js); build with VITE_API_URL=http://<host>:<port>/ or
# leave it default and serve the SPA from the same origin as the API (the
# MMDX_FRONTEND_DIR path above — same-origin needs no CORS).
set -euo pipefail

FRONTEND_SRC="${1:-}"
if [[ -z "$FRONTEND_SRC" ]]; then
    echo "usage: $0 <path-to-reference-frontend>  (needs npm)" >&2
    echo "no build needed for the bundled single-file frontend" >&2
    exit 0
fi
cd "$FRONTEND_SRC"
npm ci
npm run build
echo "built: $FRONTEND_SRC/dist — serve with MMDX_FRONTEND_DIR=$FRONTEND_SRC/dist"
