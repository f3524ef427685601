#!/usr/bin/env bash
# Multi-version numerics matrix: one venv per jax pin, each running the
# committed-baseline drift gate (tools/validate.py --check).
#
# TPU analogue of the reference's cross-torch-version driver
# (/root/reference/scripts/gpu_validate.sh:1-60 — one venv per torch
# 2.8-2.13, deterministic observable dump, diff vs a same-run baseline).
# Here the baseline is COMMITTED (tools/validate_baseline.json), so every
# pin is gated against the same truth rather than against whichever version
# happens to run first.
#
# Usage:
#   tools/validate_matrix.sh                 # default pin list below
#   tools/validate_matrix.sh 0.9.0 0.8.1     # explicit pins
#   AIMNET_MATRIX_VENVS=/tmp/venvs tools/validate_matrix.sh
#
# Offline behavior: pip installs need egress.  When an install fails (no
# network, missing wheel for this platform), the pin is reported SKIPPED —
# the script exits 0 unless a pin that DID install fails the numerics gate.

set -u
HERE="$(cd "$(dirname "$0")" && pwd)"
REPO="$(dirname "$HERE")"
VENVS="${AIMNET_MATRIX_VENVS:-/tmp/aimnet_matrix_venvs}"
PINS=("$@")
if [ ${#PINS[@]} -eq 0 ]; then
    # current env's jax plus adjacent releases; extend as new pins ship
    PINS=("0.8.1" "0.9.0" "0.9.1")
fi

mkdir -p "$VENVS"
fail=0
results=()

# gate the CURRENT environment first — always available, no egress needed
echo "== current env: $(python -c 'import jax; print(jax.__version__)' 2>/dev/null || echo '?')"
if JAX_PLATFORMS=cpu python "$HERE/validate.py" --check; then
    results+=("current: PASS")
else
    results+=("current: FAIL")
    fail=1
fi

for pin in "${PINS[@]}"; do
    venv="$VENVS/jax-$pin"
    if [ ! -x "$venv/bin/python" ]; then
        echo "== jax==$pin: creating venv"
        python -m venv "$venv" >/dev/null 2>&1 || { results+=("jax==$pin: SKIPPED (venv)"); continue; }
    fi
    if ! "$venv/bin/python" -c "import jax, numpy" >/dev/null 2>&1; then
        echo "== jax==$pin: installing (needs egress)"
        if ! "$venv/bin/pip" install -q "jax==$pin" numpy >/dev/null 2>&1; then
            results+=("jax==$pin: SKIPPED (install failed — offline?)")
            continue
        fi
    fi
    got="$("$venv/bin/python" -c 'import jax; print(jax.__version__)' 2>/dev/null)"
    if [ "$got" != "$pin" ]; then
        results+=("jax==$pin: SKIPPED (got ${got:-none})")
        continue
    fi
    echo "== jax==$pin: running drift gate"
    if JAX_PLATFORMS=cpu PYTHONPATH="$REPO" "$venv/bin/python" "$HERE/validate.py" --check; then
        results+=("jax==$pin: PASS")
    else
        results+=("jax==$pin: FAIL")
        fail=1
    fi
done

echo
echo "== matrix summary"
printf '%s\n' "${results[@]}"
exit $fail
