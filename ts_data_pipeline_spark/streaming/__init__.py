"""Structured-Streaming veneer (SURVEY §7 phase 4).

The batch operators are pure Column expressions, so the streaming
layer is thin: the same expressions under ``readStream`` with
watermark/append semantics (T1-T3), checkpointed state (T4/T7), and
Kafka wire-format encode/decode at the edges (S5-S7).
"""
