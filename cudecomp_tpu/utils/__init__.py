"""Utility subpackage: array scatter/gather, testing oracles, env flags, tracing."""
