"""The CDC sync engine: config, schema inference/evolution, checkpointing,
backfill, streaming apply, and the sync state machine.

Re-expresses the reference daemon (reference docs/design.md) Spark-first:
buffering/batching/retry/commit plumbing is delegated to Structured
Streaming + idempotent merge writes; only genuinely custom logic lives
here (union-schema inference, the sync state machine, checkpoint table).
"""
