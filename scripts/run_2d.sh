#!/bin/bash
# Canonical 2D runs (parity with reference code/run_2d.sh):
#
# equations: poisson_2d-sin_sin       u = sin(100x) sin(100y)
#            poisson_2d-sin_add_cos   u = sin(6x)cos(20x) + sin(6y)cos(20y)
#            allencahn_2d-mix-sincos  u = (sin x + 0.1 sin 20x + cos 100x) * (...)
#            advection-sin            u = sin(x - 200 t)
set -e
cd "$(dirname "$0")/.."

python -m gphm_tpu.cli --equation poisson_2d-sin_sin --kernel Matern52_Cos_1d --nepoch 1000000
python -m gphm_tpu.cli --equation poisson_2d-sin_add_cos --kernel Matern52_Cos_1d --nepoch 1000000
python -m gphm_tpu.cli --equation allencahn_2d-mix-sincos --kernel Matern52_Cos_1d --nepoch 3000000
python -m gphm_tpu.cli --equation advection-sin --kernel Matern52_Cos_1d --nepoch 1000000
