"""Physical-plan inspection helpers (scale verification tooling)."""
