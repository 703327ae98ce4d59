"""refign-tpu: TPU-native domain-adaptive semantic segmentation + dense
matching framework (capabilities of brdav/refign, rebuilt for JAX/XLA/Pallas).
"""
__version__ = "0.1.0"

import jax as _jax

# This JAX build defaults to low-precision (bf16) matmuls/convs for float32
# inputs on every backend.  The framework's mixed-precision policy is
# explicit instead: activations are cast to bfloat16 where speed matters and
# float32 "islands" are kept where the reference forces fp32 (warp,
# correlation, softmax — SURVEY.md §7.3 item 7).  'highest' makes fp32 ops
# actually fp32 while leaving bf16 inputs on the native MXU path.
_jax.config.update("jax_default_matmul_precision", "highest")
