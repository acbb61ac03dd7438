"""Experiment runners and the CLI entry point."""
