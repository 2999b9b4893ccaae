#!/bin/bash
# Canonical 1D runs (parity with reference code/run_1d.sh):
#
# kernels: Matern52_Cos_1d -> GP-HM-Stm, SE_Cos_1d -> GP-HM-GM,
#          Matern52_1d -> GP-Matern, SE_1d -> GP-SE
#
# equations: poisson_1d-single_sin  u = sin(100x)
#            poisson_1d-x_time_sinx u = x sin(200x)
#            poisson_1d-sin_cos     u = sin(6x) cos(100x)
#            poisson_1d-mix_sin     u = sin(x) + 0.1 sin(20x) + 0.05 sin(100x)
#            poisson_1d-x2_add_sinx u = sin(500x) - 2(x-0.5)^2
#            allencahn_1d-single_sin / allencahn_1d-sin_cos
set -e
cd "$(dirname "$0")/.."

python -m gphm_tpu.cli --equation poisson_1d-single_sin --kernel Matern52_Cos_1d --nepoch 100000
python -m gphm_tpu.cli --equation poisson_1d-x_time_sinx --kernel Matern52_Cos_1d --nepoch 100000
python -m gphm_tpu.cli --equation poisson_1d-sin_cos --kernel Matern52_Cos_1d --nepoch 100000
python -m gphm_tpu.cli --equation allencahn_1d-single_sin --kernel Matern52_Cos_1d --nepoch 100000
python -m gphm_tpu.cli --equation allencahn_1d-sin_cos --kernel Matern52_Cos_1d --nepoch 100000

# The two hardest multi-scale cases need 1e6 iterations and the two-GP
# ("extra") trick; final relative error reaches ~1e-3 - 1e-4.
python -m gphm_tpu.cli --equation poisson_1d-mix_sin --kernel Matern52_Cos_1d --nepoch 1000000 --extra
python -m gphm_tpu.cli --equation poisson_1d-x2_add_sinx --kernel Matern52_Cos_1d --nepoch 1000000 --extra
