"""dfol_vqa_tpu: a TPU-native neuro-symbolic VQA framework.

A from-scratch JAX/XLA/Pallas reimplementation of the ∇-FOL differentiable
first-order-logic VQA method (capability parity with microsoft/DFOL-VQA),
built around an ahead-of-time program compiler, dense masked tensor layouts,
and jit-compiled batched execution on TPU device meshes.

Public surface (lazily imported):

    Config, TPUConfig        configuration (reference YAML surface)
    GQAOntology              vocabulary / taxonomy / embeddings
    Interpreter              the jit-compiled program executor
    ProgramCompiler          AOT program -> tensor compiler
    VQATrainer               train / test / predict loops
    GQAObjectBoxExperiment   end-to-end experiment runner
    ServingEngine            online continuous-batching inference
    ServingHTTPFrontend      HTTP daemon over the serving engine
"""

__version__ = "0.1.0"

_EXPORTS = {
    "Config": "dfol_vqa_tpu.config",
    "TPUConfig": "dfol_vqa_tpu.config",
    "GQAOntology": "dfol_vqa_tpu.ontology",
    "Interpreter": "dfol_vqa_tpu.models.interpreter",
    "ProgramCompiler": "dfol_vqa_tpu.compiler.program_compiler",
    "BucketSpec": "dfol_vqa_tpu.compiler.program_compiler",
    "VQATrainer": "dfol_vqa_tpu.train.trainer",
    "GQAObjectBoxExperiment": "dfol_vqa_tpu.experiments.experiment",
    "World": "dfol_vqa_tpu.types",
    "VariableSet": "dfol_vqa_tpu.types",
    "Quantifier": "dfol_vqa_tpu.types",
    "QuestionType": "dfol_vqa_tpu.types",
    "ServingEngine": "dfol_vqa_tpu.serve",
    "ServingHTTPFrontend": "dfol_vqa_tpu.http_frontend",
    "export_serving_set": "dfol_vqa_tpu.export",
    "load_serving_set": "dfol_vqa_tpu.export",
}

__all__ = list(_EXPORTS) + ["__version__"]


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        return getattr(importlib.import_module(_EXPORTS[name]), name)
    raise AttributeError(f"module 'dfol_vqa_tpu' has no attribute {name!r}")
