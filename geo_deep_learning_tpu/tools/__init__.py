"""Tools: experiment tracking, visualization, callbacks, schedulers, export."""
