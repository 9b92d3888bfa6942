"""Device-side execution engine: avatar store + cross-session batch scheduler."""
