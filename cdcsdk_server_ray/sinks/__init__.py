"""Sinks: actor-pool delivery stages (the ChangeConsumer family)."""
