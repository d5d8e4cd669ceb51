"""Training subsystem: TBPTT trainer, optimizer, checkpointing, metrics
(SURVEY.md §2 C14-C16, §5)."""
