"""CLI: YAML-config-driven fit/validate/test/predict entry point."""
