"""codetr_tpu — a TPU-native JAX/XLA/Pallas re-implementation of the Co-DETR
inference framework (reference: anenbergb/Co-DETR-TensorRT).

The reference compiles a PyTorch Co-DINO detector to a TensorRT engine with a
CUDA multi-scale-deformable-attention plugin.  This package re-designs the same
capability TPU-first:

- PyTorch modules          -> flax.linen modules, batch-first, NHWC convs
- torch.export + TRT       -> jax.jit AOT lowering + serialized XLA executables
                              (codetr_tpu.runtime.aot, the ".engine" analog)
- CUDA/TRT MSDA plugin     -> exact pair-packed XLA gather (measured fastest
                              on this hardware) + opt-in fused Pallas
                              shift-window kernel + pure-jnp oracle
                              (codetr_tpu.ops.msda; ROUND2_NOTES.md has the
                              measured design space)
- C++ TRT runtime          -> C++ host library (preprocess/NMS) + PJRT C-API
                              runner + python loader for serialized
                              executables

Reference layer map: /root/reference — see SURVEY.md for file:line citations.
"""

from codetr_tpu.config import (  # noqa: F401
    CoDETRConfig,
    co_dino_swin_l,
    co_dino_r50,
)

# Model imports are deliberately lazy-friendly: `import codetr_tpu` must work
# even before optional heavy deps warm up.
try:  # pragma: no cover - guard only matters mid-build
    from codetr_tpu.models.codetr import CoDETR, build_codetr  # noqa: F401
except ImportError:  # model package still under construction
    pass

__version__ = "0.1.0"
