"""Physical-plan auditing helpers (scale-guard assertions)."""
