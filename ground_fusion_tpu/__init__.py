"""ground_fusion_tpu — TPU-native tightly-coupled RGBD-IMU-wheel-GNSS SLAM.

On import, the default matmul precision is pinned to ``highest`` (true f32)
unless the user already chose one via ``JAX_DEFAULT_MATMUL_PRECISION`` or
``GROUND_FUSION_MATMUL_PRECISION``. Rationale (measured on TPU v5e): at JAX's
default (fastest/bf16) precision the estimator's normal-equation pipeline
``H = JᵀJ`` → Schur → Cholesky loses ~8 mantissa bits; with typical
``sqrt_info``-scaled Hessian diagonals of ~1e7 the bf16 rounding error
(~1e5) dwarfs any safe ridge, the marginalization Cholesky goes indefinite
(NaN) every step, and the solver falls back to eigendecompositions — both
wrong-precision AND ~5x slower (eigh is the TPU's weakest dense op). True-f32
matmuls cost 6 MXU passes but every matrix here is tiny, so the fused window
step is measurably FASTER at ``highest`` (10.2 ms vs 11.3 ms) and matches the
CPU-f64 oracle (see PARITY_TPU.md). The reference solves everything in f64
Ceres (estimator.cpp:3303-3318); this is the TPU-native equivalent choice.
"""

import os as _os

if ("JAX_DEFAULT_MATMUL_PRECISION" not in _os.environ
        and "GROUND_FUSION_MATMUL_PRECISION" not in _os.environ):
    import jax as _jax

    _jax.config.update("jax_default_matmul_precision", "highest")
elif "GROUND_FUSION_MATMUL_PRECISION" in _os.environ:
    import jax as _jax

    _jax.config.update(
        "jax_default_matmul_precision",
        _os.environ["GROUND_FUSION_MATMUL_PRECISION"],
    )
