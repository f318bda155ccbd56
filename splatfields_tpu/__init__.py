"""SplatFields-TPU: a TPU-native neural Gaussian-splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
markomih/SplatFields (ECCV 2024): differentiable 3D Gaussian splat rendering
with neural-field-predicted splat attributes for sparse 3D and 4D
reconstruction.

Layout
------
- ``ops``      : math kernels — SH eval, SSIM, KNN, grid sampling, and the
                 tile-binned differentiable rasterizer (JAX reference +
                 Pallas TPU kernels).
- ``models``   : splat parameter store (padded pytree + densification),
                 neural field networks (MLP heads, ResFields, triplane CNN
                 generators, flow heads).
- ``data``     : host-side dataset readers and camera handling.
- ``utils``    : transforms, camera matrices, schedules, image helpers.
- ``parallel`` : device-mesh construction and sharded training steps.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # honor an explicit CPU request even where a sitecustomize force-sets
    # the TPU backend programmatically (the env var alone is overridden
    # there — see CLAUDE.md); used by CI subprocesses and the protocol
    # script smoke tests
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
