#!/usr/bin/env bash
# Release hygiene smoke: prove the package installs into a CLEAN venv and
# works WITHOUT the repo checkout on sys.path.
#
#   - pip install . into a fresh venv; a .pth link to the host
#     interpreter's site-packages supplies the baked-in jax/flax/pandas
#     (the host python is itself a venv, so --system-site-packages would
#     miss them), and --no-deps/--no-build-isolation keep the check
#     offline-safe — this environment has zero egress
#   - import epidemicmodeling_tpu + __version__ consistency vs pyproject
#   - CLI --help via the installed package
#   - one tiny end-to-end pipeline run from a scratch cwd
#
# Usage: scripts/release_check.sh   (exits non-zero on any failure)
set -euo pipefail

ROOT="$(cd "$(dirname "$0")/.." && pwd)"
VENV="$(mktemp -d)/venv"
trap 'rm -rf "$(dirname "$VENV")"' EXIT

python -m venv "$VENV"
PY="$VENV/bin/python"

# dependency stand-in (offline): expose the host env's site-packages via a
# .pth; the venv's own site-packages stays FIRST on sys.path, so the
# installed-into-venv package is the one imported
HOST_SITE="$(python -c 'import site; print(site.getsitepackages()[0])')"
VENV_SITE="$("$PY" -c 'import site; print(site.getsitepackages()[0])')"
echo "$HOST_SITE" > "$VENV_SITE/_host_deps.pth"

# no sitecustomize in the venv => the baked JAX_PLATFORMS=axon env var
# would make jax fail to find the (unregistered) axon plugin; force CPU
export JAX_PLATFORMS=cpu
unset PYTHONPATH

"$PY" -m pip install --quiet --no-deps --no-build-isolation "$ROOT"

SCRATCH="$(mktemp -d)"
cd "$SCRATCH"   # away from the checkout: imports must hit site-packages

"$PY" - "$ROOT" <<'EOF'
import sys, tomllib, pathlib
import epidemicmodeling_tpu as epi

loc = pathlib.Path(epi.__file__).resolve()
root = pathlib.Path(sys.argv[1]).resolve()
assert root not in loc.parents, f"imported from the checkout: {loc}"
pv = tomllib.loads((root / "pyproject.toml").read_text())["project"]["version"]
assert epi.__version__ == pv, (epi.__version__, pv)
print(f"import OK: {loc} version={epi.__version__}")
EOF

"$PY" -m epidemicmodeling_tpu.pipelines.xprize_cli --help > /dev/null
echo "CLI --help OK"

"$PY" <<'EOF'
import numpy as np
from epidemicmodeling_tpu.data.synthetic import synthetic_oxford_frame
from epidemicmodeling_tpu.data.preprocess import (
    preprocess_region, build_region_batch, NPI_MAXES_DEFAULT)
from epidemicmodeling_tpu.pipelines import PipelineConfig
from epidemicmodeling_tpu.pipelines.train_predict_prescribe import \
    run_pipeline

_, _, truth = synthetic_oxford_frame(n_regions=2, n_days=60, seed=0)
sers, names = [], []
for name, tr in truth.items():
    nc = tr["s"] * tr["i"] * tr["alpha"] * tr["pop"]
    sers.append(preprocess_region(np.cumsum(nc), None, tr["u"], tr["pop"]))
    names.append(name)
bt = build_region_batch(sers, names)
bf = build_region_batch(sers, names, horizon=8)
cfg = PipelineConfig(backend="vmap", num_monte_carlo=4, pareto_chunk=2)
res = run_pipeline(bt, bf, None, 60, np.ones(12), np.array([1e-4, 0.5]),
                   np.zeros(12), NPI_MAXES_DEFAULT, 60, cfg)
assert np.isfinite(np.asarray(res.pareto["J0"])).all()
print("tiny end-to-end pipeline OK")
EOF

echo "release check: ALL OK"
