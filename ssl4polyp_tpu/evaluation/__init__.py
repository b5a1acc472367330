"""Evaluation loop, artifact exporters, standalone eval CLI."""
