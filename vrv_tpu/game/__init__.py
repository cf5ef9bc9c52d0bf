"""Game layer: world model, event-sourced orchestration, managers."""
