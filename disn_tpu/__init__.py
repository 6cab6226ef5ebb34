"""disn_tpu — a TPU-native (JAX/XLA/Pallas/pjit) single-view 3D reconstruction framework.

Re-imagines the capabilities of DISN (Deep Implicit Surface Network, NeurIPS 2019;
reference implementation: laughtervv/DISN, TensorFlow 1.x + CUDA) as an idiomatic
TPU framework:

* pure-functional models (pytrees of params) compiled with ``jax.jit`` / ``pjit``
* the per-point hot path (camera projection -> multi-scale bilinear feature
  sampling -> two-stream SDF MLP) runs as fused, MXU-friendly device code
* dense SDF grids are sharded over a ``jax.sharding.Mesh`` (the query-point axis
  is embarrassingly parallel) and extracted to meshes by an on-device
  marching-cubes implementation
* Chamfer / EMD / F-score / IoU evaluators are jitted device code instead of
  CUDA custom ops
* a native C++ toolchain (``disn_tpu/cpp``) owns the host-side geometry work the
  reference delegated to prebuilt Vega-FEM binaries (mesh -> distance field,
  host marching cubes for parity testing).
"""

__version__ = "0.1.0"

from disn_tpu.config import Config, Variant, EncoderKind  # noqa: F401
