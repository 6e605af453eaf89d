"""Structured Streaming layer: windows, stateful ops, exactly-once sink."""
