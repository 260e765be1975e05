"""Training: tasks, optimizers/schedules, jitted steps, fit/eval loops, checkpointing."""
