"""Training subsystem: optimizer (reference AdamW + exponential-decay
semantics), jitted train step, checkpointing, metric logging."""
