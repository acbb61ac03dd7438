"""dfol_vqa_tpu: a TPU-native neuro-symbolic VQA framework.

A from-scratch JAX/XLA/Pallas reimplementation of the ∇-FOL differentiable
first-order-logic VQA method (capability parity with microsoft/DFOL-VQA),
built around an ahead-of-time program compiler, dense masked tensor layouts,
and jit-compiled batched execution on TPU device meshes.
"""

__version__ = "0.1.0"
