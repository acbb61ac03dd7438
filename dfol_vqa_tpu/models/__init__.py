"""Neural modules: featurizer, oracle, calibrator, program executor."""
