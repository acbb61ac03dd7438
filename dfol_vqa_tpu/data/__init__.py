"""Datasets, feature sources, batching and device transfer pipelines."""
